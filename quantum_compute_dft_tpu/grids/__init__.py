from quantum_compute_dft_tpu.grids.builder import Grid, build_grid, load_grid_file  # noqa: F401
