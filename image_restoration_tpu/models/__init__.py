from image_restoration_tpu.models.registry import get_model, register_model, MODELS  # noqa: F401
from image_restoration_tpu.models import restormer  # noqa: F401
