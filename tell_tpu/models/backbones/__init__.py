from .roberta import (
    RobertaConfig,
    init_roberta,
    roberta_encode,
    convert_hf_roberta,
)
from .resnet import (
    ResNetConfig,
    init_resnet,
    resnet_forward,
    convert_torchvision_resnet,
)
