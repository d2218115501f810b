from .table import LakeTable, state_hash

__all__ = ["LakeTable", "state_hash"]
