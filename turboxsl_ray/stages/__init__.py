"""Ray Data stages: each stage is a function Dataset -> Dataset built
from map_batches / repartition(keys) / groupby, never raw row loops.

The execution discipline (SURVEY.md §4): ONE hash shuffle by
(conv_id[, salt]) creates partition-local blocks holding whole
conversations; every window / as-of / sessionize kernel then runs
partition-local and vectorized — the Ray Data analog of the
reference's "subtree = unit of independent work"
(/root/reference/src/template_task.c:24-99)."""
