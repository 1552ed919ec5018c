"""Query plans: the driver-checked operator battery plus the reference's
end-to-end dataflow pipelines (harvester / downloader) re-expressed as
Spark plans.

Each battery module registers named queries into a shared registry via
the ``@q`` decorator; ``registry.all_queries()`` / ``all_oracles()``
are what ``__spark_entry__.py`` exposes to the driver.
"""

from . import registry  # noqa: F401
