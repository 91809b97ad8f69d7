from ta3n_tpu.data.feature_store import FeatureStore
from ta3n_tpu.data.loader import Batch, TSNLoader, prefetch
from ta3n_tpu.data.manifest import (VideoRecord, epoch_balance_counts,
                                    load_class_names, parse_list_file,
                                    repeat_to)
from ta3n_tpu.data.quantized import (dequantize_rows, is_quantized,
                                     quantize_rows)
from ta3n_tpu.data.streaming import ShardPlan, ShardStream

__all__ = [
    "FeatureStore",
    "Batch",
    "TSNLoader",
    "prefetch",
    "ShardPlan",
    "ShardStream",
    "quantize_rows",
    "dequantize_rows",
    "is_quantized",
    "VideoRecord",
    "epoch_balance_counts",
    "load_class_names",
    "parse_list_file",
    "repeat_to",
]
