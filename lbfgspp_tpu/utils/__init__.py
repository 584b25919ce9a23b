from . import objectives

__all__ = ["objectives"]
