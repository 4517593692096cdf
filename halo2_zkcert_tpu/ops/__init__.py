"""Device kernels: limb field arithmetic, curve ops, NTT, MSM."""
