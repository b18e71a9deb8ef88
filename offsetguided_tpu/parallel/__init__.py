from .mesh import make_mesh, batch_sharding, replicated, param_sharding
from .train_step import (TrainState, create_train_state, make_optimizer,
                         make_train_step, jit_train_step, make_eval_step, step_lr_schedule,
                         cyclic_lr_schedule)

__all__ = ['make_mesh', 'batch_sharding', 'replicated', 'param_sharding',
           'TrainState', 'create_train_state', 'make_optimizer',
           'make_train_step', 'jit_train_step', 'make_eval_step', 'step_lr_schedule',
           'cyclic_lr_schedule']
