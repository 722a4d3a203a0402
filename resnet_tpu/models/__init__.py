from .init import init_bn_state, init_params, param_count
from .resnet import forward, predict

__all__ = ["init_bn_state", "init_params", "param_count", "forward", "predict"]
