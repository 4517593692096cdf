"""halo2_zkcert_tpu — a TPU-native halo2-style (PLONKish/KZG) proving framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of the
`halo2-zkcert` reference stack (X.509 certificate-chain proving with halo2 +
KZG over BN254): field/curve limb kernels, NTT, Pippenger MSM, Poseidon /
Keccak Fiat-Shamir transcripts, PLONKish keygen + prover + verifier with
SHPLONK multiopen, and the RSA / SHA256 / aggregation circuit families —
designed for SPMD execution over TPU device meshes.

Package layout:
  ops/       device kernels: limb field arithmetic, NTT, MSM, curve ops
  core/      proof system: domains, KZG/SHPLONK, constraint system, prover
  models/    circuit families (RSA sig-verify, SHA256, X509 aggregation)
  parallel/  mesh/sharding strategies (MSM psum, NTT all-to-all)
  utils/     ground-truth reference crypto, serialization, SRS management
"""

__version__ = "0.1.0"
