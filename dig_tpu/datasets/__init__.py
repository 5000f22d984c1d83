from .qm9 import QM93D
from .md17 import MD17
from .synthetic import synthetic_molecules
from .loader import MoleculeLoader

__all__ = ["QM93D", "MD17", "synthetic_molecules", "MoleculeLoader"]
