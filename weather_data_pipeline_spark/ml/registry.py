"""JSON model registry (SURVEY.md S13; reference
`src/ml_models/model_registry.py` — kept driver-side, no Spark needed).

Append-only versions file: register() assigns v{n+1}, records a SHA-256 of
the artifact directory contents, metrics, and feature list; promote/compare
helpers mirror the reference's API surface (`model_registry.py:23-135`).
"""

from __future__ import annotations

import hashlib
import json
import os
from datetime import datetime, timezone
from typing import Any


class ModelRegistry:
    def __init__(self, registry_path: str):
        self.path = registry_path
        if not os.path.exists(self.path):
            self._write({"models": []})

    def _read(self) -> dict:
        with open(self.path) as f:
            return json.load(f)

    def _write(self, data: dict) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=2)
        os.replace(tmp, self.path)

    @staticmethod
    def hash_artifact(path: str) -> str:
        """SHA-256 over the artifact tree (sorted walk, so deterministic)."""
        h = hashlib.sha256()
        if os.path.isfile(path):
            with open(path, "rb") as f:
                h.update(f.read())
            return h.hexdigest()
        for root, _dirs, files in sorted(os.walk(path)):
            for name in sorted(files):
                p = os.path.join(root, name)
                h.update(os.path.relpath(p, path).encode())
                with open(p, "rb") as f:
                    for chunk in iter(lambda: f.read(1 << 20), b""):
                        h.update(chunk)
        return h.hexdigest()

    def register(
        self,
        artifact_path: str,
        model_type: str,
        metrics: dict[str, float],
        feature_columns: list[str] | None = None,
        description: str = "",
    ) -> dict[str, Any]:
        data = self._read()
        version = len(data["models"]) + 1
        entry = {
            "version": version,
            "model_type": model_type,
            "artifact_path": artifact_path,
            "artifact_sha256": self.hash_artifact(artifact_path),
            "metrics": metrics,
            "num_features": len(feature_columns or []),
            "feature_columns": feature_columns or [],
            "description": description,
            "registered_at": datetime.now(timezone.utc).isoformat(),
        }
        data["models"].append(entry)
        self._write(data)
        return entry

    def list_versions(self) -> list[dict]:
        return self._read()["models"]

    def get_version(self, version: int) -> dict | None:
        for m in self._read()["models"]:
            if m["version"] == version:
                return m
        return None

    def latest(self) -> dict | None:
        models = self._read()["models"]
        return models[-1] if models else None

    def compare(self, v1: int, v2: int, metric: str) -> dict:
        a, b = self.get_version(v1), self.get_version(v2)
        if a is None or b is None:
            raise KeyError("unknown version")
        return {
            "metric": metric,
            f"v{v1}": a["metrics"].get(metric),
            f"v{v2}": b["metrics"].get(metric),
            "delta": (b["metrics"].get(metric) or 0) - (a["metrics"].get(metric) or 0),
        }

    def verify_artifact(self, version: int) -> bool:
        m = self.get_version(version)
        return bool(
            m
            and os.path.exists(m["artifact_path"])
            and self.hash_artifact(m["artifact_path"]) == m["artifact_sha256"]
        )
