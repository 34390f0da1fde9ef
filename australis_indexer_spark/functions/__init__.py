from . import codecs, det

__all__ = ["codecs", "det"]
