from .tse import init_loss as init_tse_loss
from .tse import init_model as init_tse_model
from .ns import init_loss as init_ns_loss
from .ns import init_model as init_ns_model

__all__ = ["init_tse_loss", "init_tse_model", "init_ns_loss", "init_ns_model"]
