from .geocode import extract_text, geocode  # noqa: F401
from .cellassign import assign_cells  # noqa: F401
from .pip import PIPJoinStage  # noqa: F401
