"""Query planning layer: the Telemetry QuerySpec evaluator.

This is the engine's main public query API — the Spark restatement
of the reference's Telemetry Query API contract
(dashboard/src/Models/getDataRequest.ts and friends). A QuerySpec is
compiled into ONE declarative DataFrame plan, so Catalyst applies
predicate pushdown, partition pruning, and partial aggregation
end-to-end.
"""
