from .stream_apply import StreamingCdcApply

__all__ = ["StreamingCdcApply"]
