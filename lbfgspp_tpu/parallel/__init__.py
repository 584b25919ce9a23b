from . import collectives

__all__ = ["collectives"]
