"""Model zoo: ResNet backbone, refinement decoder, full DMM model."""

from dmm_net_tpu.models.resnet import ResNet, ResNet18, ResNet50  # noqa: F401
from dmm_net_tpu.models.decoder import RefinementDecoder  # noqa: F401
from dmm_net_tpu.models.dmm import DMMNet  # noqa: F401
