from .meters import AverageMeter, Throughput
from .logging import configure, log_record

__all__ = ['AverageMeter', 'Throughput', 'configure', 'log_record']
