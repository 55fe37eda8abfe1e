from . import spec
from .oracle import OracleEngine

__all__ = ["spec", "OracleEngine"]
