from .textops import TEXT_QUERIES, TEXT_ORACLE
from .similarity import SIM_QUERIES, SIM_ORACLE

__all__ = ["TEXT_QUERIES", "TEXT_ORACLE", "SIM_QUERIES", "SIM_ORACLE"]
