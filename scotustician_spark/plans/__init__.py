from .registry import QUERY_REGISTRY, Query, register  # noqa: F401

# importing the package registers every query module — keeps
# __spark_entry__ / bench / tests / tools automatically in sync
from . import relational  # noqa: E402,F401
from . import vectors_text  # noqa: E402,F401
from . import ml_analysis  # noqa: E402,F401
from . import events_windows  # noqa: E402,F401
from . import multimodal_ann  # noqa: E402,F401
from . import embedding_q  # noqa: E402,F401
from . import temporal_q  # noqa: E402,F401
from . import corpus_q  # noqa: E402,F401
from . import quality_q  # noqa: E402,F401
from . import analytics_q  # noqa: E402,F401
from . import audit_q  # noqa: E402,F401
