from ta3n_tpu.models.backbones.resnet import (ResNetFeatures,
                                              import_torch_resnet,
                                              resnet_feature_dim)
from ta3n_tpu.models.backbones.c3d import C3DFeatures, import_torch_c3d

__all__ = ["ResNetFeatures", "import_torch_resnet", "resnet_feature_dim",
           "C3DFeatures", "import_torch_c3d"]
