"""PLONKish proof system core (KZG + SHPLONK over BN254, TPU-native).

Layer L2/L4 of SURVEY.md §1: keygen, prover, verifier, commitment scheme.
"""
from .assignment import BlindingRng, CircuitData
from .cs import ADVICE, FIXED, INSTANCE, Column, ConstraintSystem
from .domain import Domain
from .keygen import ProvingKey, VerifyingKey, keygen
from .kzg import ParamsKZG, gen_srs, setup
from .mock import MockFailure, run_mock
from .prover import create_proof, instance_lagrange
from .verifier import verify_proof
