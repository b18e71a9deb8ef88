from .network import PoseNet, basenet_factory, create_model_state, count_params
from .hourglass104 import Hourglass104
from .hourglass4stage import Hourglass4Stage
from .heads import PoseHeads

__all__ = ['PoseNet', 'basenet_factory', 'create_model_state', 'count_params',
           'Hourglass104', 'Hourglass4Stage', 'PoseHeads']
