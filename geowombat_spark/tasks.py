"""GeoTask — a declarative task-graph scheduler over lazy DataFrame plans.

Reference: ``/root/reference/src/geowombat/tasks/pipeline.py:469-668``
(``GeoTask``): a dict-shaped DAG — ``inputs`` maps task id → file path(s)
or upstream task id(s), ``tasks`` is the ordered ``(task_id, func)``
chain, ``outputs`` maps task ids to write targets — executed sequentially
with ``config``/``open``/per-task function arguments, plus ``__add__``
pipeline composition and a ``visualize`` graph dump.

Spark twist: the reference materializes an xarray result per task; here
every task returns a LAZY DataFrame, so the whole graph composes into ONE
Catalyst plan per terminal output — intermediate tasks cost nothing
unless written. Writing goes through the resumable tiled sink when the
frame carries ``tile_id`` (plain parquet otherwise), so a multi-output
pipeline inherits mid-job resume per output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .config import config as _config_ctx


class GeoTask:
    """Declarative DAG: ``inputs``/``outputs``/``tasks`` dicts shaped like
    the reference's (``pipeline.py:473-533``).

    - ``inputs[task_id]`` — a path (opened via ``api.open`` with
      ``open_args``), an upstream task id, or a tuple of either (the
      task function then receives a list).
    - ``tasks`` — ordered ``((task_id, func), ...)``; ``func(src,
      **func_args[task_id])`` returns a DataFrame.
    - ``outputs[task_id]`` — ``"mem|name"`` keeps the lazy frame under
      ``name`` in the result dict (the reference's in-memory target);
      any other string is a write path.
    """

    def __init__(
        self,
        inputs: dict,
        outputs: dict,
        tasks: tuple,
        config_args: dict | None = None,
        open_args: dict | None = None,
        func_args: dict | None = None,
        out_args: dict | None = None,
    ):
        self.inputs = dict(inputs)
        self.outputs = dict(outputs)
        self.tasks = tuple(tasks)
        self.config_args = dict(config_args or {})
        self.open_args = dict(open_args or {})
        self.func_args = dict(func_args or {})
        self.out_args = dict(out_args or {})
        ids = [t for t, _ in self.tasks]
        if len(set(ids)) != len(ids):
            raise ValueError(f"duplicate task ids in {ids}")
        for tid in ids:
            if tid not in self.inputs:
                raise ValueError(f"task {tid!r} has no inputs entry")
        # a typo'd outputs key would silently write NOTHING (the run
        # completes green with missing data) — validate up front
        unknown_out = set(self.outputs) - set(ids)
        if unknown_out:
            raise ValueError(
                f"outputs keyed by unknown task ids: {sorted(unknown_out)} "
                f"(tasks are {ids})"
            )
        # same silent-typo class for func_args: a misspelled key means the
        # task runs with DEFAULT arguments and the pipeline completes
        # green with wrong data
        unknown_fa = set(self.func_args) - set(ids)
        if unknown_fa:
            raise ValueError(
                f"func_args keyed by unknown task ids: {sorted(unknown_fa)} "
                f"(tasks are {ids})"
            )
        # out_args is per-task or flat, never a mix: a flat dict that
        # happens to share a key with a task id would silently flip
        # interpretation
        oa_ids = set(self.out_args) & set(ids)
        if oa_ids and set(self.out_args) - set(ids):
            raise ValueError(
                "out_args mixes task-id keys with flat writer options: "
                f"{sorted(self.out_args)} — key everything by task id"
            )

    def __add__(self, other: "GeoTask") -> "GeoTask":
        """Pipeline composition (``pipeline.py:107-146``): the right side
        may reference the left side's task ids as inputs."""
        overlap = {t for t, _ in self.tasks} & {t for t, _ in other.tasks}
        if overlap:
            raise ValueError(f"task ids defined on both sides: {overlap}")
        return GeoTask(
            {**self.inputs, **other.inputs},
            {**self.outputs, **other.outputs},
            self.tasks + other.tasks,
            config_args={**self.config_args, **other.config_args},
            open_args={**self.open_args, **other.open_args},
            func_args={**self.func_args, **other.func_args},
            out_args={**self.out_args, **other.out_args},
        )

    def __len__(self) -> int:
        return len(self.tasks)

    def visualize(self) -> str:
        """Text graph (no graphviz in env): one line per task,
        ``id <- inputs -> output``."""
        ids = {t for t, _ in self.tasks}
        lines = []
        for tid, fn in self.tasks:
            src = self.inputs[tid]
            srcs = src if isinstance(src, (tuple, list)) else (src,)
            shown = ", ".join(
                s if s in ids else f"file:{s}" for s in map(str, srcs)
            )
            out = self.outputs.get(tid, "-")
            name = getattr(fn, "__name__", str(fn))
            lines.append(f"{tid} <- [{shown}] :: {name} -> {out}")
        return "\n".join(lines)

    def _resolve(self, spark: SparkSession, src, results: dict) -> DataFrame:
        if isinstance(src, (tuple, list)):
            return [self._resolve(spark, s, results) for s in src]
        if isinstance(src, str) and src in results:
            return results[src]
        if isinstance(src, str) and src in {t for t, _ in self.tasks}:
            # a KNOWN task id that has no result yet is an ordering bug,
            # not a file path — falling through to api.open would read a
            # coincidentally-named file (silent wrong data) or die with a
            # misleading PATH_NOT_FOUND
            raise ValueError(
                f"input {src!r} references a task that has not run yet — "
                "tasks execute in declaration order; move it earlier"
            )
        from . import api

        return api.open(spark, src, **self.open_args)

    def submit(self, spark: SparkSession) -> dict:
        """Run the pipeline (``pipeline.py:589-668``). Returns one dict:

        - ``{task_id: DataFrame}`` for EVERY task (written or not — the
          frame is never clobbered by its write artifact);
        - ``{mem_name: DataFrame}`` for ``mem|`` outputs;
        - ``{f"{task_id}:written": manifest DataFrame | None}`` for write
          targets (the tiled sink's manifest, or None for plain parquet).

        All intermediate results stay lazy — only write targets trigger
        jobs."""
        results: dict = {}
        named: dict = {}
        with _config_ctx(**self.config_args):
            for tid, fn in self.tasks:
                src = self._resolve(spark, self.inputs[tid], results)
                kwargs = self.func_args.get(tid, {})
                res = fn(src, **kwargs)
                results[tid] = res
                target = self.outputs.get(tid)
                if target is None:
                    continue
                if isinstance(target, str) and target.startswith("mem|"):
                    named[target.split("|", 1)[1]] = res
                    continue
                # out_args is keyed by task id like func_args (the
                # reference's per-task shape, ``pipeline.py:533``); a flat
                # dict is accepted for single-output pipelines when no key
                # matches a task id (mixing is rejected in __init__).
                # 'mode' belongs to the plain-parquet writer only and is
                # stripped before the tiled sink.
                out_kw = dict(self.out_args.get(tid, {}))
                if not out_kw and self.out_args and not any(
                    t in self.out_args for t, _ in self.tasks
                ):
                    out_kw = dict(self.out_args)
                mode = out_kw.pop("mode", "overwrite")
                if "tile_id" in res.columns:
                    from .plans.checkpoint import write_tiled_checkpointed

                    named[f"{tid}:written"] = write_tiled_checkpointed(
                        res, target, **out_kw
                    )
                else:
                    res.write.mode(mode).parquet(target)
                    named[f"{tid}:written"] = None
        return {**results, **named}
