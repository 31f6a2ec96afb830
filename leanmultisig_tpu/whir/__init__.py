from .config import (FoldingFactor, WhirConfig, WhirConfigBuilder,
                     default_whir_config_builder)
from .merkle import WhirMerkleTree
from .prover import Witness, commit, open_
from .statement import SparseStatement, SparseValue
from .verifier import ParsedCommitment, parse_commitment, verify

__all__ = [
    "FoldingFactor", "WhirConfig", "WhirConfigBuilder",
    "default_whir_config_builder", "WhirMerkleTree", "Witness", "commit",
    "open_", "SparseStatement", "SparseValue", "ParsedCommitment",
    "parse_commitment", "verify",
]
