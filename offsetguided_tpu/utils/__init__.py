from .meters import AverageMeter, Throughput
from .logging import configure, log_record
from .profiling import StageTimer, device_time, trace
from .cache import enable_persistent_cache, host_cache_dir

__all__ = ['AverageMeter', 'Throughput', 'configure', 'log_record',
           'StageTimer', 'device_time', 'trace',
           'enable_persistent_cache', 'host_cache_dir']
