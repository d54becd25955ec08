from thunder_tpu.io.mrc import read_mrc, write_mrc, MrcFile  # noqa: F401
from thunder_tpu.io.thu import ThuTable, read_thu, write_thu  # noqa: F401
