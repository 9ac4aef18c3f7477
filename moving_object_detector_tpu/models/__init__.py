"""Neural models: the PWC-Net-style optical-flow network."""

from .pwc_net import PWCNet, create_pwc_net, init_pwc_params

__all__ = ["PWCNet", "create_pwc_net", "init_pwc_params"]
