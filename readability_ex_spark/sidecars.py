"""Unified lifecycle for the corpus build's sidecar artifacts.

A corpus directory carries several underscore-prefixed parquet
artifacts next to the data (Spark/DuckDB both ignore ``_*`` paths when
reading the corpus itself):

- ``_manifest`` — every extracted url's keep decision (dedup audit)
- ``_bands`` — persisted banded-LSH index (incremental near-dup)
- ``_emb_sigs`` — persisted embedding band-code/signature index
  (incremental embedding near-dup; key-complete — zero-norm text
  carries NULL codes so heal can tell a crash from a sig-less doc)
- ``_chunk_df`` — pre-verdict boilerplate chunk counts (additive)
- ``_lm_vocab`` — the frozen unigram LM the corpus was filtered by
- ``_quality_stats`` / ``_datacard`` — per-run rollups (rewritten)

Each used to carry bespoke exists/load/append/repair code in the build
script; this module is the one code path.  Two lifecycle classes:

- **keyed** artifacts (``_manifest``, ``_bands``) have one-or-more
  rows per corpus key and can be REPAIRED: the appends of an update
  run (corpus, then sidecars) are not atomic, so a crash between them
  leaves corpus rows the sidecars never learned about; orphans are
  detected with column-pruned key scans (free when there are none) and
  re-derived from the written corpus rows alone.
- **aggregate/frozen** artifacts cannot be re-derived from the written
  corpus (``_chunk_df`` counts pre-clean text that is gone;
  ``_lm_vocab`` is a frozen model) — their crash posture is documented
  where they are written: ``_chunk_df`` is appended BEFORE the corpus
  lands, so a crash leaves it counting a batch that never shipped
  (over-counting — the conservative direction for a boilerplate cap);
  ``_lm_vocab`` is write-once.

``_sidecars.json`` is the versioned manifest: which artifacts this
corpus carries and the lifecycle version that wrote them, so a future
layout change can detect (and migrate) older corpora instead of
silently misreading them.

Deployment constraint: existence checks and the JSON manifest use
``pathlib`` and the sidecar writes use Spark, so the CORPUS PATH MUST
BE A LOCAL FILESYSTEM (the sandbox's deployment shape).  An
object-store/HDFS deployment swaps the ``Path`` calls here (and the
``shutil`` staging moves in ``scripts/prepare_corpus.py`` /
``scripts/compact_corpus.py``) for the Hadoop FileSystem API — this
module is deliberately the one seam where that change lands.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

SIDECAR_VERSION = 1


def sidecar_path(output: str, name: str) -> str:
    return f"{output.rstrip('/')}/{name}"


def sidecar_exists(output: str, name: str) -> bool:
    return Path(sidecar_path(output, name)).exists()


def load_sidecar(
    spark: SparkSession, output: str, name: str
) -> DataFrame | None:
    """The sidecar as a DataFrame, or None if this corpus lacks it."""
    if not sidecar_exists(output, name):
        return None
    return spark.read.parquet(sidecar_path(output, name))


def write_sidecar(
    df: DataFrame, output: str, name: str, mode: str = "overwrite"
) -> None:
    df.write.mode(mode).parquet(sidecar_path(output, name))


def record_sidecars(
    output: str, names: list[str], params: dict | None = None
) -> None:
    """Write/refresh the versioned ``_sidecars.json`` manifest (the
    union of artifacts ever recorded for this corpus).  ``params``
    records build parameters that MUST stay fixed across updates (e.g.
    the ``--split`` fractions — a corpus banded under two different
    thresholds is silently contaminated); they merge over previous
    values so unrelated runs don't erase them."""
    p = Path(output) / "_sidecars.json"
    known: set[str] = set()
    kept_params: dict = {}
    if p.exists():
        try:
            doc = json.loads(p.read_text())
            if doc.get("version", 0) > SIDECAR_VERSION:
                raise RuntimeError(
                    f"corpus sidecars were written by a newer layout "
                    f"(version {doc['version']} > {SIDECAR_VERSION}); "
                    "refusing to extend them"
                )
            known = set(doc.get("artifacts", []))
            kept_params = dict(doc.get("params", {}))
        except (ValueError, KeyError):
            pass  # corrupt manifest: rewrite from scratch
    known.update(names)
    kept_params.update(params or {})
    p.write_text(
        json.dumps(
            {
                "version": SIDECAR_VERSION,
                "artifacts": sorted(known),
                "params": kept_params,
            },
            indent=1,
        )
    )


def read_sidecar_params(output: str) -> dict:
    """The pinned build parameters from ``_sidecars.json`` (empty if
    the corpus predates the manifest or records none)."""
    p = Path(output) / "_sidecars.json"
    if not p.exists():
        return {}
    try:
        return dict(json.loads(p.read_text()).get("params", {}))
    except (ValueError, KeyError, TypeError, AttributeError):
        return {}


@dataclass(frozen=True)
class SidecarSpec:
    """A keyed, orphan-repairable sidecar.

    ``rederive(existing, orphan_keys)`` must return the sidecar rows
    for exactly those corpus keys, derived from the written corpus
    alone (``existing`` is the corpus DataFrame, ``orphan_keys`` a
    single-column frame of ``key_col`` values).
    """

    name: str
    key_col: str
    rederive: Callable[[DataFrame, DataFrame], DataFrame]


def heal_sidecars(
    spark: SparkSession,
    output: str,
    existing: DataFrame,
    specs: list[SidecarSpec],
) -> dict[str, int]:
    """Self-heal before extending: for every keyed sidecar that exists,
    find corpus keys it is missing (column-pruned scans), re-derive
    those rows, and append them.  Returns per-sidecar repair counts.

    Run this at the START of an update, before any sidecar is trusted
    or extended — the shared repair pass the bespoke per-artifact
    blocks used to duplicate.
    """
    repaired: dict[str, int] = {}
    for spec in specs:
        side = load_sidecar(spark, output, spec.name)
        if side is None:
            continue
        orphan_keys = (
            existing.select(spec.key_col)
            .join(side.select(spec.key_col), spec.key_col, "left_anti")
            .localCheckpoint(eager=True)  # key-only scans, both sides
        )
        n = orphan_keys.count()
        if n:
            write_sidecar(
                spec.rederive(existing, orphan_keys),
                output,
                spec.name,
                mode="append",
            )
        repaired[spec.name] = n
    return repaired
