from image_restoration_tpu.core import mesh, precision  # noqa: F401
from image_restoration_tpu.core.precision import Policy, DEFAULT_POLICY, PARITY_POLICY  # noqa: F401
from image_restoration_tpu.core.mesh import make_mesh, AxisNames  # noqa: F401
