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
    'Co': {'1s': 26.472968413358327, '2sp': 11.086008592412183, '3sp': 4.561769667442745, '3d': 3.908816594453304, '4sp': 1.2},
    'Cr': {'1s': 23.515955590832085, '2sp': 9.655961671121437, '3sp': 3.8778696485710373, '3d': 3.01257309747181, '4sp': 1.2},
    'Cu': {'1s': 28.44456447649533, '2sp': 12.044522263973217, '3sp': 4.945668735729854, '3d': 4.199334382654753, '4sp': 1.2},
    'Fe': {'1s': 25.487321031446932, '2sp': 10.608341761035303, '3sp': 4.3439662767407485, '3d': 3.6954765416808515, '4sp': 1.2},
    'Ga': {'1s': 30.416134620890478, '2sp': 12.985810835062878, '3sp': 5.457109340808521, '3d': 5.030072834991981, '4sp': 1.6872267508704981},
    'Ge': {'1s': 31.401214355536148, '2sp': 13.456569856884562, '3sp': 5.723613938070453, '3d': 5.417234896037669, '4sp': 1.8451021436695139},
    'I': {'1s': 52.03880739455679, '2sp': 23.329032018783874, '3sp': 11.5734753323807, '3d': 13.000346556711014, '4sp': 6.067145366755585, '4d': 5.240900592337866, '5sp': 2.4080208168709563},
    'In': {'1s': 48.11390185691956, '2sp': 21.446336251687338, '3sp': 10.49414845515406, '3d': 11.588695908716137, '4sp': 5.11351653995, '4d': 4.2567189236839615, '5sp': 1.791179735247283},
    'Kr': {'1s': 35.33787628089015, '2sp': 15.339298823602835, '3sp': 6.841934924246865, '3d': 6.877558683251375, '4sp': 2.5394991805268097},
    'Mn': {'1s': 24.501865298192254, '2sp': 10.129956154517606, '3sp': 4.118272774056397, '3d': 3.517639694551381, '4sp': 1.2},
    'Mo': {'1s': 41.23681587116105, '2sp': 18.158928403434153, '3sp': 8.540143813421002, '3d': 9.09164475648133, '4sp': 3.825368469839717, '4d': 2.9477617572910297, '5sp': 1.2},
    'Ni': {'1s': 27.4587692888584, '2sp': 11.563058354134437, '3sp': 4.7733632833213475, '3d': 4.140573156024738, '4sp': 1.2},
    'Sc': {'1s': 20.55783560899773, '2sp': 8.216785975953915, '3sp': 3.253140077839589, '3d': 2.112587373675, '4sp': 1.2},
    'Se': {'1s': 33.370214395685366, '2sp': 14.397886422572862, '3sp': 6.275617097047505, '3d': 6.160906366444516, '4sp': 2.1863614303780188},
    'Sn': {'1s': 49.095201012484196, '2sp': 21.916623636335192, '3sp': 10.764118659364101, '3d': 11.94329089912068, '4sp': 5.370308855275, '4d': 4.505894009119706, '5sp': 1.9474219065359866},
    'Ti': {'1s': 21.543422646369297, '2sp': 8.696560852583165, '3sp': 3.4915977225732306, '3d': 2.4253905393699444, '4sp': 1.2},
    'V': {'1s': 22.529421437076536, '2sp': 9.175023353317945, '3sp': 3.706858847702039, '3d': 2.84663302366433, '4sp': 1.2},
    'Zn': {'1s': 29.43078115663999, '2sp': 12.515510911732937, '3sp': 5.182617947833801, '3d': 4.628999745794158, '4sp': 1.2},
}
