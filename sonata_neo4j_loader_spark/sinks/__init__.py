from . import materialize

__all__ = ["materialize"]
