"""Model registry with governance — MLflow-registry semantics
(ml/registry.py:20-65,99-308,361-400) with pluggable storage backends.

Two backends share ONE governance implementation (GovernanceMixin): stage
lifecycle (None -> Staging -> Production -> Archived), required tags for
production (clinical_use, validation_status, performance_gate),
performance-gate and validation-approval checks, and the
single-production-version invariant (promoting archives the incumbent).

- ``ModelRegistry`` persists to a local JSON file (always available).
- ``MlflowModelRegistry`` drives an ``mlflow.tracking.MlflowClient`` —
  the reference's backend (ml/registry.py:67-89 setup + client calls) —
  when mlflow is importable, or any object implementing the same five
  client methods (which is how the adapter is contract-tested in
  environments without mlflow).

``make_registry(store)`` picks the backend: an mlflow-looking URI with
mlflow importable -> MlflowModelRegistry, else the JSON store.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field

STAGES = ["None", "Staging", "Production", "Archived"]
REQUIRED_PRODUCTION_TAGS = ["clinical_use", "validation_status", "performance_gate"]
_METRICS_TAG = "_metrics_json"


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


class GovernanceMixin:
    """Clinical governance rules over backend primitives ``_versions``,
    ``_set_stage``, ``_apply_tags`` (reference validate_model_governance +
    promote_model_to_stage, ml/registry.py:99-308)."""

    def _versions(self, name: str) -> list[ModelVersion]:  # pragma: no cover
        raise NotImplementedError

    def _set_stage(self, name: str, version: int, stage: str) -> None:  # pragma: no cover
        raise NotImplementedError

    def _apply_tags(self, name: str, version: int, tags: dict) -> None:  # pragma: no cover
        raise NotImplementedError

    def set_tags(self, name: str, version: int, tags: dict) -> None:
        self._apply_tags(name, version, tags)

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
        if stage == "Production":
            for v in self._versions(name):
                if v.stage == "Production" and v.version != version:
                    self._set_stage(name, v.version, "Archived")
        self._set_stage(name, version, stage)
        return next(v for v in self._versions(name) if v.version == version)

    def get_production_version(self, name: str) -> ModelVersion | None:
        prod = [v for v in self._versions(name) if v.stage == "Production"]
        return prod[-1] if prod else None


class ModelRegistry(GovernanceMixin):
    """JSON-file backend (always available in this environment)."""

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

    def _apply_tags(self, name: str, version: int, tags: dict) -> None:
        for v in self._store.get(name, []):
            if v["version"] == version:
                v["tags"].update(tags)
        self._save()

    def _set_stage(self, name: str, version: int, stage: str) -> None:
        for v in self._store.get(name, []):
            if v["version"] == version:
                v["stage"] = stage
        self._save()


class MlflowModelRegistry(GovernanceMixin):
    """MLflow-client backend — the reference's storage (ml/registry.py).

    ``client`` is an ``mlflow.tracking.MlflowClient`` or any object with
    the five methods used here (create_registered_model,
    create_model_version, search_model_versions, set_model_version_tag,
    transition_model_version_stage). Model-version metrics live on runs in
    MLflow, so the adapter snapshots them into a reserved tag — the same
    trick the reference uses for its governance-relevant numbers (it tags
    performance_gate rather than re-reading run metrics)."""

    def __init__(self, client=None, tracking_uri: str | None = None):
        if client is None:
            import mlflow  # gated: not installed in this sandbox
            from mlflow.tracking import MlflowClient

            if tracking_uri:
                mlflow.set_tracking_uri(tracking_uri)
            client = MlflowClient(tracking_uri=tracking_uri)
        self.client = client

    def register(
        self, name: str, metrics: dict, tags: dict | None = None,
        artifact_path: str | None = None,
    ) -> ModelVersion:
        try:
            self.client.create_registered_model(name)
        except Exception:
            pass  # already registered
        tags = dict(tags or {})
        tags[_METRICS_TAG] = json.dumps(metrics)
        raw = self.client.create_model_version(
            name=name, source=artifact_path or "(none)", tags=tags
        )
        return self._to_model_version(raw)

    @staticmethod
    def _to_model_version(raw) -> ModelVersion:
        tags = dict(raw.tags or {})
        metrics = json.loads(tags.pop(_METRICS_TAG, "{}"))
        return ModelVersion(
            name=raw.name,
            version=int(raw.version),
            stage=getattr(raw, "current_stage", None) or "None",
            tags=tags,
            metrics=metrics,
            created_at=(getattr(raw, "creation_timestamp", 0) or 0) / 1000.0,
            artifact_path=getattr(raw, "source", None),
        )

    def _versions(self, name: str) -> list[ModelVersion]:
        raw = self.client.search_model_versions(f"name='{name}'")
        return sorted((self._to_model_version(r) for r in raw), key=lambda v: v.version)

    def _apply_tags(self, name: str, version: int, tags: dict) -> None:
        for k, v in tags.items():
            self.client.set_model_version_tag(name, str(version), k, v)

    def _set_stage(self, name: str, version: int, stage: str) -> None:
        self.client.transition_model_version_stage(name, str(version), stage)


def mlflow_available() -> bool:
    try:
        import mlflow  # noqa: F401

        return True
    except ImportError:
        return False


def make_registry(store: str):
    """Backend factory: mlflow URIs (``http(s)://``, ``sqlite://``, or an
    explicit ``mlflow:`` prefix) get the MLflow adapter when mlflow is
    importable; everything else — including those URIs without mlflow on
    the path — falls back to the JSON registry at ``store``."""
    looks_mlflow = store.startswith(("http://", "https://", "sqlite://", "mlflow:"))
    if looks_mlflow and mlflow_available():
        return MlflowModelRegistry(tracking_uri=store.removeprefix("mlflow:"))
    return ModelRegistry(store if not looks_mlflow else "registry.json")
