from . import vector  # noqa: F401
from . import text  # noqa: F401
