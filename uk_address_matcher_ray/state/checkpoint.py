"""Per-stage Parquet checkpoints with lineage manifests + resume.

North-rule requirement: every stage writes per-partition Parquet plus a
manifest (stage name, input fingerprint, row/counter stats) so a failed run
resumes mid-pipeline by skipping completed stages. Writes are idempotent:
data lands in a temp dir that is atomically renamed, and the manifest is
written last — a partial stage directory without a manifest is re-executed.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional

MANIFEST = "_MANIFEST.json"


@dataclass
class PipelineRun:
    """Driver-side stage runner with checkpoint/resume.

    Usage:
        run = PipelineRun(root="/tmp/ckpt/run1")
        ds = run.stage("cleaned_messy", fingerprint, lambda: build_ds())
    """

    root: str
    counters: Dict[str, float] = field(default_factory=dict)

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def manifest_path(self, name: str) -> str:
        return os.path.join(self._dir(name), MANIFEST)

    def is_complete(self, name: str, fingerprint: str) -> bool:
        p = self.manifest_path(name)
        if not os.path.exists(p):
            return False
        try:
            with open(p) as f:
                m = json.load(f)
            return m.get("fingerprint") == fingerprint
        except Exception:
            return False

    def stage(
        self,
        name: str,
        fingerprint: str,
        build: Callable[[], "object"],
        counters: Optional[Dict[str, float]] = None,
    ):
        """Run (or resume) one stage; returns the stage's Dataset.

        ``build()`` must return a ray.data.Dataset. On a cache hit the stage
        is NOT re-executed — its checkpoint parquet is read back.
        """
        import ray

        out_dir = self._dir(name)
        if self.is_complete(name, fingerprint):
            with open(self.manifest_path(name)) as f:
                m = json.load(f)
            self.counters.update(
                {f"{name}.{k}": v for k, v in m.get("counters", {}).items()}
            )
            return ray.data.read_parquet(out_dir)

        tmp_dir = out_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.monotonic()
        ds = build()
        ds.write_parquet(tmp_dir)
        elapsed = time.monotonic() - t0
        os.rename(tmp_dir, out_dir)

        back = ray.data.read_parquet(out_dir)
        rows = back.count()
        stage_counters = {"rows": rows, "elapsed_sec": round(elapsed, 3)}
        if counters:
            stage_counters.update(counters)
        manifest = {
            "stage": name,
            "fingerprint": fingerprint,
            "counters": stage_counters,
            "files": sorted(
                f for f in os.listdir(out_dir) if not f.startswith("_")
            ),
        }
        with open(self.manifest_path(name) + ".tmp", "w") as f:
            json.dump(manifest, f, indent=1)
        os.rename(self.manifest_path(name) + ".tmp", self.manifest_path(name))
        self.counters.update({f"{name}.{k}": v for k, v in stage_counters.items()})
        return back
