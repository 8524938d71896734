from quantum_compute_dft_tpu.cli import main

import sys

sys.exit(main())
