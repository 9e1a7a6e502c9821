"""Per-partition checkpoint + lineage (SURVEY.md §4 "Checkpoint / resume").

Contract (north rule): every stage writes per-partition Parquet under
``<root>/checkpoints/<stage>/part=<k>.parquet`` with a write-then-rename
commit protocol and a per-partition manifest recording row count + config
hash; on restart, partitions whose manifest matches the current config hash
are **read back instead of recomputed** — a killed run resumes without
rescoring completed blocks. This mirrors the reference's skip-if-logged
semantics (/root/reference/database.py:328-358) at partition granularity.

The partition key is always derivable from a row *before* the stage's
compute (hash64(url) % P for fingerprints, hash64(band_key-partition) for
edges), so resume can filter the stage's INPUT to incomplete partitions and
skip the compute itself, not just the write.
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq


def config_hash(obj) -> str:  # noqa: ANN001
    """Stable hash of the pipeline config — a config change invalidates
    checkpoints (they were computed under different semantics)."""
    blob = json.dumps(obj, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


class StageCheckpoint:
    """One stage's per-partition checkpoint directory."""

    def __init__(self, root: str, stage: str, cfg_hash: str, num_parts: int) -> None:
        self.dir = os.path.join(root, "checkpoints", stage)
        self.stage = stage
        self.cfg_hash = cfg_hash
        self.num_parts = num_parts
        # optional per-part counter hook: fn(group_table) -> {name: int},
        # persisted in the manifest so stage observability costs ZERO extra
        # jobs (metrics are read back from manifests, and survive resume)
        self.extras_fn = None
        os.makedirs(self.dir, exist_ok=True)

    def _manifest_path(self, part: int) -> str:
        return os.path.join(self.dir, f"part={part}.manifest.json")

    def data_path(self, part: int) -> str:
        return os.path.join(self.dir, f"part={part}.parquet")

    def completed_parts(self) -> set[int]:
        done = set()
        for p in range(self.num_parts):
            mp = self._manifest_path(p)
            if os.path.exists(mp):
                try:
                    with open(mp) as f:
                        m = json.load(f)
                    if m.get("config_hash") == self.cfg_hash and os.path.exists(self.data_path(p)):
                        done.add(p)
                except (json.JSONDecodeError, OSError):
                    pass  # torn manifest from a kill mid-write -> recompute
        return done

    def write_part(self, part: int, table: pa.Table) -> dict:
        """Atomic write-then-rename commit; manifest written last (the
        commit point). Returns the lineage/metrics record."""
        tmp = self.data_path(part) + f".tmp-{uuid.uuid4().hex}"
        pq.write_table(table, tmp)
        os.replace(tmp, self.data_path(part))
        rec = {
            "stage": self.stage,
            "part": part,
            "rows": table.num_rows,
            "config_hash": self.cfg_hash,
        }
        if self.extras_fn is not None:
            rec["extras"] = {k: int(v) for k, v in self.extras_fn(table).items()}
        mtmp = self._manifest_path(part) + f".tmp-{uuid.uuid4().hex}"
        with open(mtmp, "w") as f:
            json.dump(rec, f)
        os.replace(mtmp, self._manifest_path(part))
        return rec

    def transform_group(self, table: pa.Table) -> pa.Table:
        """Hook: per-part transform applied between the stage's group fn and
        the part write (e.g. the fingerprint stage's D1 url dedup). May
        legitimately return 0 rows — the part file is then an explicit
        empty (still a completed part)."""
        return table

    def make_group_writer(self, schema: pa.Schema, group_fn=None):  # noqa: ANN001
        """A map_groups callable — the WRITE-THROUGH checkpoint point.

        Extracts the part id from the INPUT group (before any transform:
        ``group_fn``/``transform_group`` may legitimately empty a part),
        applies ``group_fn`` (the stage's per-part compute, optional) then
        :meth:`transform_group`, writes the part file atomically inside the
        cluster, and returns the WRITTEN ROWS. The stage output therefore
        streams straight out of the same exchange that wrote the
        checkpoint — no driver take_all, no re-read of just-written files,
        no second groupby (VERDICT r2 #1: one exchange + one barrier per
        stage instead of three)."""
        ckpt = self
        names = [f.name for f in schema]

        def write_group(group: pa.Table) -> pa.Table:
            from ..pipelines import _pin_arrow_threads

            _pin_arrow_threads()
            part = int(group["part"][0].as_py())
            out = group_fn(group) if group_fn is not None else group
            out = ckpt.transform_group(out)
            sel = out.select(names)
            ckpt.write_part(part, sel)
            return sel

        return write_group

    def manifest_totals(self) -> dict:
        """Summed per-part manifest counters: {'rows': N, <extras>: ...} —
        stage metrics for free (no Ray job), resume-safe."""
        tot: dict = {"rows": 0}
        for p in self.completed_parts():
            with open(self._manifest_path(p)) as f:
                m = json.load(f)
            tot["rows"] += m.get("rows", 0)
            for k, v in m.get("extras", {}).items():
                tot[k] = tot.get(k, 0) + v
        return tot

    def write_lineage(self, extra: dict) -> None:
        """Stage-level _lineage.json (written under this stage's checkpoint
        dir): config hash + per-part row counts."""
        parts = {}
        for p in sorted(self.completed_parts()):
            with open(self._manifest_path(p)) as f:
                parts[str(p)] = json.load(f)["rows"]
        rec = {"stage": self.stage, "config_hash": self.cfg_hash,
               "num_parts": self.num_parts, "rows_per_part": parts, **extra}
        path = os.path.join(self.dir, "_lineage.json")
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(rec, f, indent=1)
        os.replace(tmp, path)
