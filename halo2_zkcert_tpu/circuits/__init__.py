"""Application circuits (layer L5/L3b of SURVEY.md §1): SHA-256, RSA,
and the X.509 aggregation circuit."""
