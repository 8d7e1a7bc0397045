from .registry import build_model, available_models, register

__all__ = ["build_model", "available_models", "register"]
