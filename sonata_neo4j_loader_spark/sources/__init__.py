from . import spikes

__all__ = ["spikes"]
