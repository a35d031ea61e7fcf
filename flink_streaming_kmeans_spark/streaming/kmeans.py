"""Streaming (online) k-means — the reference's core behavior.

Reference analog: KMeansClustering.java's stateful co-operator
(expected — SURVEY.md §3.1 [PK]; checkout was empty): features arrive
continuously, each is assigned to the nearest centroid, and that
centroid's running mean moves incrementally (MacQueen-style update),
with moved centroids visible to subsequent assignments via Flink's
iteration feedback edge.

Spark Structured Streaming has no iteration edge; the idiomatic
replacement (SURVEY.md §2.9/§7) is ``foreachBatch`` + driver-held
state: per micro-batch, one narrow mapInPandas pass computes
vectorized assignments and per-cluster partial (sum, count) against
the CURRENT centroids; the driver then applies the batch MacQueen
update

    c' = (c * n + batch_sum) / (n + batch_count)

so centroids move once per micro-batch instead of once per record —
the standard mini-batch relaxation of the reference's per-record
update (identical in the limit of 1-row batches).

Scale: per batch, work is one scan + a k×P-row collect; state is the
k×d matrix + k counts on the driver. No shuffle, no growing lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.kmeans import _partial_stats_fn


class StreamingKMeans:
    """Driver-held online k-means state, updated per micro-batch.

    ``state_path`` makes the state durable across query restarts: after
    every applied batch the (C, n, cids, last_batch_id) tuple is written
    atomically (tmp + os.replace, same protocol as the lakehouse
    manifest commit). A restarted query constructs with the same
    ``state_path`` and resumes exactly where the previous incarnation
    stopped; Structured Streaming's own checkpoint guarantees
    unprocessed batches are re-delivered, and the ``last_batch_id``
    guard makes a RE-delivered already-applied batch a no-op — together
    that is effectively-once state update, the standard foreachBatch
    idempotence pattern.
    """

    def __init__(self, init_centroids, cids, state_path: str | None = None):
        import numpy as np

        self.C = np.array(init_centroids, dtype="float64")  # k×d
        self.cids = np.array(cids)
        self.n = np.zeros(len(cids), dtype="int64")
        self.batches_seen = 0
        self.last_batch_id = -1
        self.state_path = state_path
        if state_path is not None:
            import os

            if os.path.exists(state_path):
                self._load()

    def _save(self) -> None:
        import io
        import os
        import uuid

        import numpy as np

        buf = io.BytesIO()
        np.savez(
            buf,
            C=self.C,
            cids=self.cids,
            n=self.n,
            meta=np.array([self.batches_seen, self.last_batch_id], dtype="int64"),
        )
        tmp = f"{self.state_path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(buf.getvalue())
        os.replace(tmp, self.state_path)

    def _load(self) -> None:
        import numpy as np

        with np.load(self.state_path) as d:
            self.C = d["C"]
            self.cids = d["cids"]
            self.n = d["n"]
            self.batches_seen, self.last_batch_id = (int(x) for x in d["meta"])

    def update_batch(self, batch_df: DataFrame) -> None:
        """foreachBatch body: combine-assign against current centroids,
        then apply the batch MacQueen update."""
        import numpy as np

        partials = batch_df.select("vec_id", "embedding").mapInPandas(
            _partial_stats_fn(self.C, self.cids),
            "cid int, psum array<double>, n bigint",
        ).collect()
        if not partials:
            return
        sums = np.zeros_like(self.C)
        counts = np.zeros(len(self.cids), dtype="int64")
        pos = {int(c): j for j, c in enumerate(self.cids)}
        for r in partials:
            j = pos[int(r.cid)]
            sums[j] += np.array(r.psum)
            counts[j] += int(r.n)
        nz = counts > 0
        denom = (self.n + counts)[nz, None]
        self.C[nz] = (self.C[nz] * self.n[nz, None] + sums[nz]) / denom
        self.n += counts
        self.batches_seen += 1

    def foreach_batch(self):
        def fn(batch_df, batch_id):
            if batch_id <= self.last_batch_id:
                return  # re-delivered batch already applied — no-op
            self.update_batch(batch_df)
            self.last_batch_id = int(batch_id)
            if self.state_path is not None:
                self._save()

        return fn
