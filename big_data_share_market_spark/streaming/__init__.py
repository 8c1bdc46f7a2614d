"""Structured Streaming layer (SURVEY §2.G): event-time + watermark
(G1/G2), tumbling-window OHLC bar construction (G5), bounded per-key
state (G6 via applyInPandasWithState), and the idempotent upsert sink
(G3/G4 via foreachBatch last-write-wins).

`batch_parity` registers driver-checkable queries: each runs the REAL
streaming query over the fixture with an availableNow trigger into a
memory sink and returns the result as a DataFrame, so streaming
semantics are oracle-verified, not just smoke-tested.
"""
