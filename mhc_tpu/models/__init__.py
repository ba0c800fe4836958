from .entropy import MARKOV, ORDER0, EntropyModel, get_model

__all__ = ["EntropyModel", "get_model", "ORDER0", "MARKOV"]
