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

``track_assignments=True`` adds the OTHER half of the reference
semantics (the r4-verdict gap): per-point assignment memory across
batches, so a re-arriving point that the moved centroids now place in
a different cluster is SUBTRACTED from its old cluster as it is added
to the new one — Feature add/remove arithmetic. State is held as
per-cluster running sums (S, n) with C = S/n, which makes removal
exact (each centroid is always the exact mean of its current members)
and conserves mass: Σn == #distinct points seen. Assumes re-arrivals
carry the same vector (the reference's loop re-circulates immutable
Features); value-updating re-arrivals would need per-point vector
state (N×d), out of scope.

Scale: per batch, work is one scan + a k×P-row collect; state is the
k×d matrix + k counts on the driver (+ the vec_id→cid map when
tracking — ids only; its production home is the state store).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.kmeans import _partial_stats_fn, _reassign_delta_fn


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

    def __init__(
        self,
        init_centroids,
        cids,
        state_path: str | None = None,
        track_assignments: bool = False,
    ):
        import numpy as np

        self.C = np.array(init_centroids, dtype="float64")  # k×d
        self.cids = np.array(cids)
        self.n = np.zeros(len(cids), dtype="int64")
        # Running per-cluster vector sums: C == S/n wherever n>0 (a
        # cluster with no members keeps its init/last centroid). Using
        # (S, n) as the state — the reference Feature add/subtract
        # arithmetic — is numerically IDENTICAL to the previous
        # C'=(C*n+sum)/(n+cnt) form when no point is ever removed, and
        # is what makes removal exact when one is.
        self.S = np.zeros_like(self.C)
        # vec_id -> cid assignment memory (the analog of the reference
        # co-operator's keyed state; production home would be the
        # transformWithState state store — blocked in this container,
        # streaming/stateful.py:8-14 — so it is driver-held here, ids
        # only, no vectors).
        self.assign_of: dict | None = {} if track_assignments else None
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

        amap = self.assign_of
        buf = io.BytesIO()
        np.savez(
            buf,
            C=self.C,
            S=self.S,
            cids=self.cids,
            n=self.n,
            meta=np.array([self.batches_seen, self.last_batch_id], dtype="int64"),
            track=np.array([amap is not None], dtype="int64"),
            assign_ids=np.array(
                sorted(amap) if amap else [], dtype="int64"
            ),
            assign_cids=np.array(
                [amap[i] for i in sorted(amap)] if amap else [], dtype="int64"
            ),
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
            # Older state files predate (S, assignment) persistence.
            self.S = d["S"] if "S" in d.files else self.C * self.n[:, None]
            # The state file's tracking mode must MATCH the instance's:
            # restoring tracked mass (n/S include every distinct point)
            # without the assignment map would double-count every
            # re-arrival, and restoring untracked state into a tracking
            # instance silently flips the arithmetic. Fail loudly.
            file_track = "track" in d.files and bool(d["track"][0])
            if file_track != (self.assign_of is not None):
                raise ValueError(
                    f"state file track_assignments={file_track} does not"
                    f" match instance track_assignments="
                    f"{self.assign_of is not None} — refusing to resume"
                    " with inconsistent mass accounting"
                )
            if file_track:
                self.assign_of = dict(
                    zip(
                        (int(i) for i in d["assign_ids"]),
                        (int(c) for c in d["assign_cids"]),
                    )
                )
            self.batches_seen, self.last_batch_id = (int(x) for x in d["meta"])

    def update_batch(self, batch_df: DataFrame) -> None:
        """foreachBatch body: combine-assign against current centroids,
        then apply the batch MacQueen update.

        With ``track_assignments``, a re-arriving point that the moved
        centroids now place elsewhere is REMOVED from its old cluster
        (vector subtracted, count decremented) as it is added to the
        new one — the reference co-operator's add/remove arithmetic —
        so every centroid stays the exact mean of its CURRENT members
        and total mass equals the number of distinct points seen."""
        import numpy as np

        sums = np.zeros_like(self.C)
        counts = np.zeros(len(self.cids), dtype="int64")
        pos = {int(c): j for j, c in enumerate(self.cids)}
        if self.assign_of is None:
            partials = batch_df.select("vec_id", "embedding").mapInPandas(
                _partial_stats_fn(self.C, self.cids),
                "cid int, psum array<double>, n bigint",
            ).collect()
            if not partials:
                return
            for r in partials:
                j = pos[int(r.cid)]
                sums[j] += np.array(r.psum)
                counts[j] += int(r.n)
        else:
            sc = batch_df.sparkSession.sparkContext
            assign_bc = sc.broadcast(self.assign_of)
            try:
                rows = batch_df.select("vec_id", "embedding").mapInPandas(
                    _reassign_delta_fn(self.C, self.cids, assign_bc),
                    "kind int, vec_id bigint, cid int,"
                    " psum array<double>, n bigint",
                ).collect()
            finally:
                assign_bc.unpersist()
            if not rows:
                return
            # kind=1 rows arrive for EVERY processed point (not just
            # cluster flips) — this flag is only an empty-batch guard.
            saw_points = False
            for r in rows:
                if r.kind == 0:
                    j = pos[int(r.cid)]
                    sums[j] += np.array(r.psum)
                    counts[j] += int(r.n)
                else:
                    saw_points = True
                    self.assign_of[int(r.vec_id)] = int(r.cid)
            if not saw_points:
                return
        self.S += sums
        self.n += counts
        nz = self.n > 0
        self.C[nz] = self.S[nz] / self.n[nz, None]
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
