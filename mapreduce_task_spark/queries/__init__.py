"""Query definitions, grouped by SURVEY.md §2 / §7 build-plan area.

Importing this package registers every query into
``mapreduce_task_spark.registry``.
"""

from . import reference_jobs  # noqa: F401
from . import relational  # noqa: F401
from . import llm_dedup  # noqa: F401
from . import llm_text  # noqa: F401
from . import advanced  # noqa: F401
from . import subqueries  # noqa: F401
from . import llm_prep  # noqa: F401
from . import pipeline_e2e  # noqa: F401
from . import timeseries  # noqa: F401
from . import graph_analytics  # noqa: F401
from . import scrub  # noqa: F401
from . import tokenizer  # noqa: F401
