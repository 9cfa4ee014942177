"""Pre-checkpoint stage-plan capture — closes the plan audit's
checkpoint blind spot (VERDICT r10 Next #3).

``localCheckpoint`` truncates lineage, so ``tools/plan_audit.py``
previously saw only the post-checkpoint readout plans of the composed
reports (8 exchanges for ``q_dedup_report``) while the 52-exchange
pair/component stages the report actually pays were invisible. Every
checkpoint in a composed plan or propagation loop now routes through
:func:`ckpt`, which hands the PRE-checkpoint DataFrame to whatever
sink the auditor installed before truncating. With no sink installed
(production), :func:`ckpt` is exactly ``localCheckpoint`` /
``checkpoint`` — zero overhead, zero behavior change.

The auditor additionally marks any audited plan containing an
``ExistingRDD`` scan (the checkpoint scar) as ``checkpointed`` so a
truncated lineage can never silently masquerade as a cheap plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: when a list, ``ckpt``/``record`` append ``(stage, df)`` PRE-truncation
SINK: list[tuple[str, DataFrame]] | None = None


def record(stage: str, df: DataFrame) -> None:
    """Offer a pre-checkpoint stage plan to the installed audit sink
    (no-op outside an audit)."""
    if SINK is not None:
        SINK.append((stage, df))


def ckpt(df: DataFrame, stage: str, *, reliable: bool = False) -> DataFrame:
    """Checkpoint ``df`` eagerly, first recording its pre-truncation
    plan under ``stage`` for the plan audit. ``reliable=True`` uses a
    cluster-durable ``checkpoint()`` (requires ``setCheckpointDir``) —
    the preemptible-cluster switch the composed reports expose."""
    record(stage, df)
    return (
        df.checkpoint(eager=True) if reliable
        else df.localCheckpoint(eager=True)
    )
