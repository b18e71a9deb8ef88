from .meters import AverageMeter, Throughput
from .logging import configure, log_record
from .profiling import StageTimer, device_time, trace

__all__ = ['AverageMeter', 'Throughput', 'configure', 'log_record',
           'StageTimer', 'device_time', 'trace']
