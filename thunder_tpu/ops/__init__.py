from thunder_tpu.ops import fourier  # noqa: F401
from thunder_tpu.ops import projector  # noqa: F401
from thunder_tpu.ops import likelihood  # noqa: F401
from thunder_tpu.ops import insert  # noqa: F401
