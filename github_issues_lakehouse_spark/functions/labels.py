"""Label-rule Column expressions — the reference's Silver business
rules re-expressed as Catalyst expressions over ``array<string>``.

Reference semantics covered (file:line cites for parity checking):
- ticket_kind      silver.py:41-50  (first-match: bug > docs >
                   enhancement > question > other)
- priority_tier    silver.py:53-74  (P0/P1 lists; P2 fallback iff
                   defect with a bug label)
- component        silver.py:77-98  (prefix rule, then allowlist,
                   then first non-meta label, else "other")

All rules are pure Column expressions (arrays_overlap / filter /
element_at) — JVM-side, whole-stage-codegen friendly, no Python UDFs.
Rule data mirrors the reference's ``config.yml``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


def _default_kind_labels() -> dict[str, list[str]]:
    return {
        "bug": ["Bug"],
        "enhancement": ["Enhancement"],
        "docs": ["Docs"],
        "question": ["Usage Question"],
    }


def _default_process_labels() -> list[str]:
    return [
        "Needs Triage",
        "Needs Discussion",
        "Needs Info",
        "Closing Candidate",
        "good first issue",
        "Needs Tests",
        "Duplicate Report",
        "Upstream issue",
    ]


def _default_priority_tiers() -> dict[str, list[str]]:
    return {"P0": ["Blocker", "Blocker for rc", "Segfault"], "P1": ["Regression"]}


def _default_component_prefixes() -> list[str]:
    return ["component:", "module:", "area:"]


def _default_component_allowlist() -> list[str]:
    return [
        "Indexing", "Groupby", "Arrow", "Datetime", "Reshaping",
        "Missing-data", "Dtype Conversions", "Performance", "IO CSV",
        "Strings", "Error Reporting", "Deprecate", "MultiIndex",
        "Apply", "Build", "API Design", "Numeric Operations",
        "IO Excel", "ExtensionArray", "Visualization", "Categorical",
        "Index", "API - Consistency", "Window", "Reduction Operations",
        "IO SQL", "IO JSON", "NA - MaskedArrays", "IO Data", "Frequency",
    ]


@dataclass
class LakehouseRules:
    """Configurable business rules (reference ``config.yml``)."""

    kind_labels: dict[str, list[str]] = field(default_factory=_default_kind_labels)
    process_labels: list[str] = field(default_factory=_default_process_labels)
    priority_tiers: dict[str, list[str]] = field(default_factory=_default_priority_tiers)
    p2_fallback_if_bug: bool = True
    component_prefixes: list[str] = field(default_factory=_default_component_prefixes)
    component_allowlist: list[str] = field(default_factory=_default_component_allowlist)
    time_buckets_hours: list[int] = field(default_factory=lambda: [24, 72, 168, 336])
    hours_in_month: int = 720

    def meta_labels(self) -> list[str]:
        """Labels that must not become components (silver.py:116-120)."""
        out = set(self.process_labels)
        for v in self.kind_labels.values():
            out.update(v)
        out.update(self.priority_tiers.get("P0", []))
        out.update(self.priority_tiers.get("P1", []))
        return sorted(out)

    @classmethod
    def from_yaml(cls, path: str) -> "LakehouseRules":
        """Load rules from the reference's ``config.yml`` schema
        (reference silver.py:106-113, gold.py:25-32) — the reference
        user's primary customization point. Keys absent from the file
        keep their defaults; the ``P2_fallback_if_bug`` flag lives
        inside ``priority_tiers`` in the reference schema.
        """
        import yaml

        with open(path, encoding="utf-8") as f:
            cfg = yaml.safe_load(f) or {}
        rules = cfg.get("rules", {}) or {}
        kw: dict = {}
        if "kind_labels" in rules:
            kw["kind_labels"] = {k: list(v or []) for k, v in rules["kind_labels"].items()}
        if "process_labels" in rules:
            kw["process_labels"] = list(rules["process_labels"] or [])
        tiers = rules.get("priority_tiers")
        if tiers is not None:
            kw["priority_tiers"] = {
                k: list(v) for k, v in tiers.items() if isinstance(v, list)
            }
            kw["p2_fallback_if_bug"] = bool(tiers.get("P2_fallback_if_bug", True))
        comp = rules.get("component")
        if comp is not None:
            if "prefixes" in comp:
                kw["component_prefixes"] = list(comp["prefixes"] or [])
            if "allowlist" in comp:
                kw["component_allowlist"] = list(comp["allowlist"] or [])
        if "time_buckets_hours" in rules:
            kw["time_buckets_hours"] = [int(b) for b in rules["time_buckets_hours"]]
        if "hours_in_month" in rules:
            kw["hours_in_month"] = int(rules["hours_in_month"])
        return cls(**kw)


def _overlaps(labels: Column, wanted: list[str]) -> Column:
    if not wanted:
        return F.lit(False)
    return F.arrays_overlap(labels, F.array(*[F.lit(w) for w in wanted]))


def ticket_kind(labels: Column, rules: LakehouseRules | None = None) -> Column:
    """silver.py:41-50 — first matching kind wins, in the reference's
    check order bug -> docs -> enhancement -> question."""
    r = rules or LakehouseRules()
    return (
        F.when(_overlaps(labels, r.kind_labels.get("bug", [])), F.lit("defect"))
        .when(_overlaps(labels, r.kind_labels.get("docs", [])), F.lit("docs"))
        .when(_overlaps(labels, r.kind_labels.get("enhancement", [])), F.lit("enhancement"))
        .when(_overlaps(labels, r.kind_labels.get("question", [])), F.lit("question"))
        .otherwise(F.lit("other"))
    )


def priority_tier(labels: Column, kind: Column, rules: LakehouseRules | None = None) -> Column:
    """silver.py:53-74 — explicit P0/P1 always honored; P2 fallback
    only for defects carrying a bug label."""
    r = rules or LakehouseRules()
    p0 = _overlaps(labels, r.priority_tiers.get("P0", []))
    p1 = _overlaps(labels, r.priority_tiers.get("P1", []))
    has_bug = _overlaps(labels, r.kind_labels.get("bug", []))
    p2 = F.lit("P2") if r.p2_fallback_if_bug else F.lit("NA")
    defect_branch = F.when(p0, "P0").when(p1, "P1").when(has_bug, p2).otherwise("NA")
    other_branch = F.when(p0, "P0").when(p1, "P1").otherwise("NA")
    return F.when(kind == "defect", defect_branch).otherwise(other_branch)


def component(labels: Column, rules: LakehouseRules | None = None) -> Column:
    """silver.py:77-98 — three-stage resolution, each stage scanning
    labels in array order:

    1. first label whose lowercased form startswith a prefix ->
       text after the first ':' (trimmed), or "other" if no ':';
    2. first label in the allowlist;
    3. first label not in the meta set;
    4. literal "other".
    """
    r = rules or LakehouseRules()
    prefixes = [p.lower().strip() for p in r.component_prefixes]

    def has_prefix(lab: Column) -> Column:
        low = F.trim(F.lower(lab))
        cond = F.lit(False)
        for p in prefixes:
            cond = cond | low.startswith(p)
        return cond

    prefix_hit = F.try_element_at(F.filter(labels, has_prefix), F.lit(1))
    # The reference splits on the FIRST colon (split(":", 1)[1]);
    # strip everything up to and including the first ':'.
    prefix_component = F.when(
        prefix_hit.contains(":"),
        F.trim(F.regexp_replace(prefix_hit, r"^[^:]*:", "")),
    ).otherwise(F.lit("other"))

    allow = F.array(*[F.lit(a) for a in r.component_allowlist])
    allow_hit = F.try_element_at(F.filter(labels, lambda l: F.array_contains(allow, l)), F.lit(1))

    meta = F.array(*[F.lit(m) for m in r.meta_labels()])
    nonmeta_hit = F.try_element_at(F.filter(labels, lambda l: ~F.array_contains(meta, l)), F.lit(1))

    return (
        F.when(prefix_hit.isNotNull(), prefix_component)
        .when(allow_hit.isNotNull(), allow_hit)
        .when(nonmeta_hit.isNotNull(), nonmeta_hit)
        .otherwise(F.lit("other"))
    )


def resolution_hours(created_at: Column, closed_at: Column) -> Column:
    """silver.py:179-180 — hours between created and closed; NULL for
    open issues."""
    # cast to LTZ first (parquet NTZ columns can't cast straight to
    # double); created/closed shift identically so the difference is
    # timezone-invariant
    c1 = created_at.cast("timestamp").cast("double")
    c2 = closed_at.cast("timestamp").cast("double")
    return F.when(closed_at.isNotNull() & created_at.isNotNull(), (c2 - c1) / 3600.0)
