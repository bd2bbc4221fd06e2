from . import me, predict, update, transform, motion_coding  # noqa: F401
from .transform import MCTFStream, LevelData, analyze, synthesize  # noqa: F401
