"""Generational fold kernel shared by the streamed-index compactions
(embedding bucket/vector store, document signature store).

Streaming sinks grow an append-only store of per-micro-batch partitions
(`<dir>/batch_id=N/` + `_SUCCESS`); every reader unions the base index
with all committed partitions. That union list grows without bound — at
100 TB a day of micro-batches is thousands of partitions in every read.
The fold is the compaction that completes the lifecycle the way
rewrite_data_files completes the table lifecycle: rebuild the base layout
from (current generation + committed streamed partitions), commit the new
generation, truncate what was folded.

Protocol (crash-safe at every step):
  gen-0 is the corpus-derived base index; fold N reads gen-(N-1)'s parquet
  (never recomputes earlier folds), writes gen-N under a temp dir,
  atomic-renames it in, then commits state.json (tmp+rename). A gen dir
  present but unreferenced by state is a partial artifact and is rebuilt;
  folded-but-undeleted streamed partitions are swept on the next call. A
  fold with nothing new is a NO-OP — replaying a compaction never changes
  reader results. Generations older than `keep_generations` are pruned
  (concurrent readers of the previous generation keep working, like
  expired-snapshot retention).
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class FoldRelation:
    """One co-folded relation: a streamed partition store plus the base
    relation it grafts onto. `base` is a thunk so gen-0 work (e.g. the
    corpus-wide index build) only runs when a first fold actually
    happens."""

    name: str
    store_dir: str
    base: object  # () -> DataFrame
    columns: tuple[str, ...]
    num_files: int
    distribute_by: tuple[str, ...] = field(default_factory=tuple)
    # Optional DataFrame -> DataFrame applied AFTER the base∪batches union
    # and BEFORE the layout repartition: additive relations (e.g. the
    # co-purchase pair-support counts) fold by re-aggregating the union
    # (one row per key in the new generation) instead of accumulating
    # per-batch partials forever. None = plain union (row-disjoint
    # relations: signatures, buckets, inverted lists, codes).
    merge: object = None


def committed_batch_ids(dirs: list[str]) -> list[int]:
    """Batch ids whose partition carries _SUCCESS in EVERY store — sinks
    write the stores in a fixed order, so requiring all of them keeps a
    crash between writes from folding half a batch."""

    def ids(d: str) -> set[int]:
        if not os.path.isdir(d):
            return set()
        return {
            int(name.split("=", 1)[1])
            for name in os.listdir(d)
            if name.startswith("batch_id=")
            and os.path.exists(os.path.join(d, name, "_SUCCESS"))
        }

    out: set[int] | None = None
    for d in dirs:
        got = ids(d)
        out = got if out is None else (out & got)
    return sorted(out or ())


def fold_streamed_partitions(
    spark: SparkSession,
    index_root: str,
    corpus_key: str,
    relations: list[FoldRelation],
    keep_generations: int = 2,
) -> dict:
    """Run one fold cycle; returns {"generation", "folded_batches",
    "noop"}. `corpus_key` pins the base corpus + index geometry — a fold
    root built over a different corpus refuses rather than silently
    mixing indexes."""
    os.makedirs(index_root, exist_ok=True)
    state_path = os.path.join(index_root, "state.json")
    state = {"generation": 0, "folded_batches": [], "corpus": corpus_key}
    if os.path.exists(state_path):
        with open(state_path) as f:
            state = json.load(f)
        if state.get("corpus") != corpus_key:
            raise ValueError(
                f"folded index at {index_root} was built over a different "
                "corpus/geometry — remove the directory to refold"
            )

    def _sweep_folded_partitions() -> None:
        # folded batches whose streamed partitions still exist (crash
        # between state commit and truncation, or a replayed sink write)
        for b in state["folded_batches"]:
            for rel in relations:
                p = os.path.join(rel.store_dir, f"batch_id={b}")
                if os.path.isdir(p):
                    shutil.rmtree(p)

    folded = set(state["folded_batches"])
    committed = committed_batch_ids([r.store_dir for r in relations])
    new_batches = [b for b in committed if b not in folded]
    gen = int(state["generation"])
    if not new_batches:
        _sweep_folded_partitions()
        return {"generation": gen, "folded_batches": [], "noop": True}

    new_gen = gen + 1
    gen_dir = os.path.join(index_root, f"gen-{new_gen}")
    if os.path.isdir(gen_dir):  # unreferenced partial from a crashed fold
        shutil.rmtree(gen_dir)
    # Stale temp dirs from folds that crashed MID-WRITE: their names are
    # pid-specific, so no later process would ever reuse (and thereby
    # replace) them — without this sweep they leak disk forever across
    # crash/restart cycles. Single-writer protocol (like the sinks), so
    # any gen-*.tmp-* present at entry is dead by definition.
    for name in os.listdir(index_root):
        if name.startswith("gen-") and ".tmp-" in name:
            shutil.rmtree(os.path.join(index_root, name), ignore_errors=True)
    tmp = f"{gen_dir}.tmp-{os.getpid()}"
    for rel in relations:
        if gen == 0:
            prev = rel.base()
        else:
            prev = spark.read.parquet(
                os.path.join(index_root, f"gen-{gen}", rel.name)
            )
        fresh = spark.read.parquet(
            *[os.path.join(rel.store_dir, f"batch_id={b}") for b in new_batches]
        )
        merged = prev.select(*rel.columns).unionByName(fresh.select(*rel.columns))
        if rel.merge is not None:
            merged = rel.merge(merged).select(*rel.columns)
        merged = (
            merged.repartition(rel.num_files, *rel.distribute_by)
            if rel.distribute_by
            else merged.repartition(rel.num_files)
        )
        merged.write.mode("overwrite").parquet(os.path.join(tmp, rel.name))
    os.rename(tmp, gen_dir)

    state = {
        "generation": new_gen,
        "folded_batches": sorted(folded | set(new_batches)),
        "corpus": corpus_key,
    }
    stmp = f"{state_path}.tmp-{os.getpid()}"
    with open(stmp, "w") as f:
        json.dump(state, f)
    os.replace(stmp, state_path)

    _sweep_folded_partitions()
    for g in range(1, new_gen - keep_generations + 1):
        shutil.rmtree(os.path.join(index_root, f"gen-{g}"), ignore_errors=True)
    return {"generation": new_gen, "folded_batches": new_batches, "noop": False}


def read_folded(
    spark: SparkSession, index_root: str, names: tuple[str, ...]
) -> dict[str, DataFrame] | None:
    """The committed folded generation's relations by name, hard-gated on
    every _SUCCESS; None if no fold has run (readers then use the
    corpus-derived base index as usual)."""
    state_path = os.path.join(index_root, "state.json")
    if not os.path.exists(state_path):
        return None
    with open(state_path) as f:
        state = json.load(f)
    gen = int(state["generation"])
    if gen == 0:
        return None
    gen_dir = os.path.join(index_root, f"gen-{gen}")
    for name in names:
        if not os.path.exists(os.path.join(gen_dir, name, "_SUCCESS")):
            raise RuntimeError(
                f"folded generation {gen} at {gen_dir} has no committed "
                f"{name} parquet — state.json references a broken fold"
            )
    return {
        name: spark.read.parquet(os.path.join(gen_dir, name)) for name in names
    }
