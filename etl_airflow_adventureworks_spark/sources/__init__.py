from .binary import load_media_dir  # noqa: F401
from .parquet import TABLES, load_table, register_views  # noqa: F401
