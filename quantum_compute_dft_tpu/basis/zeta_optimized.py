"""Variationally optimized STO-3G zetas for Z = 21-54 (GENERATED).

Produced by tools/apply_optimized_zetas.py from a run of
basis/atomic_scf.optimize_zetas: spherically-averaged spin-resolved
atomic-HF energy minimization over each element's shell zetas -- the
derivation procedure behind the published STO-3G tables, re-executed
because the canonical numeric tables for Z = 21-54 are unobtainable in
this offline environment (no PySCF, zero egress; see VERDICT r2 item 2).
Validation: the same optimizer run on canonical elements lands within
~1% (O: 1s 7.694 / 2sp 2.226 vs published 7.66 / 2.25).

Metal valence shells (e.g. Cu 4sp, Mo 5sp) are NOT free-atom-minimized --
that gives diffuse exponents that are wrong in molecules (cf. Na 3sp:
best-atom 0.84 vs published molecular 1.75); they are deliberately held
at the molecular-convention scale factor of the published derivations
and emitted here at that value.

Provenance tier: 'optimized' -- physically derived, same procedure as
canonical, but NOT the published numbers; sub-1e-6 Eh parity with
reference sto-3g runs remains unclaimable for these elements.
"""

OPTIMIZED: dict[str, dict[str, float]] = {
    'As': {'1s': 32.38584171989846, '2sp': 13.927262871394499, '3sp': 5.998408988225695, '3d': 5.792205720338263, '4sp': 2.034043815223146},
    'Br': {'1s': 34.35417990166987, '2sp': 14.868522608960646, '3sp': 6.557381857211236, '3d': 6.522177853578019, '4sp': 2.358231154886051},
    'Cu': {'1s': 28.44456447649533, '2sp': 12.044522263973217, '3sp': 4.945668735729854, '3d': 4.199334382654753, '4sp': 1.2},
    'I': {'1s': 52.03880739455679, '2sp': 23.329032018783874, '3sp': 11.5734753323807, '3d': 13.000346556711014, '4sp': 6.067145366755585, '4d': 5.240900592337866, '5sp': 2.4080208168709563},
    'Mo': {'1s': 41.23681587116105, '2sp': 18.158928403434153, '3sp': 8.540143813421002, '3d': 9.09164475648133, '4sp': 3.825368469839717, '4d': 2.9477617572910297, '5sp': 1.2},
    'Se': {'1s': 33.370214395685366, '2sp': 14.397886422572862, '3sp': 6.275617097047505, '3d': 6.160906366444516, '4sp': 2.1863614303780188},
}
