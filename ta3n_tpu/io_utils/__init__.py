from ta3n_tpu.io_utils.checkpoint import (load_checkpoint, save_checkpoint,
                                          save_emergency_local)
from ta3n_tpu.io_utils.logs import AverageMeter, LogFiles
from ta3n_tpu.io_utils.confusion import (confusion_matrix,
                                         per_class_topk_accuracy,
                                         plot_confusion_matrix)

__all__ = [
    "load_checkpoint",
    "save_checkpoint",
    "save_emergency_local",
    "AverageMeter",
    "LogFiles",
    "confusion_matrix",
    "per_class_topk_accuracy",
    "plot_confusion_matrix",
]
