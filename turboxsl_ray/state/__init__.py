"""Lineage manifests and checkpoint/resume (north_rule: every
partition emits a lineage record enabling resume without
recomputation). Reference analog: the optional fork/serial task-graph
GraphML dump (/root/reference/src/template_task_graph.c:145-194) —
here the record is load-bearing, not diagnostic."""
