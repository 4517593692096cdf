"""Model families — in a proving framework the "models" are the circuit
families (SURVEY.md §1 layer L5).  Canonical home: `..circuits`; re-exported
here so the package layout mirrors the standard models/ops/parallel/utils
structure.
"""
from ..circuits.rsa import RsaCircuit
from ..circuits.sha256 import Sha256Circuit

__all__ = ["RsaCircuit", "Sha256Circuit"]
