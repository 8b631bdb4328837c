"""Name-keyed operator/sink registry.

kpipe's MessageProcessorRegistry keeps two concurrent namespaces keyed by
(name, type) and tolerates missing keys with a warn-once identity
passthrough (MessageProcessorRegistry.java:51-182). That enables fully
config-driven pipelines (``PROCESSOR_PIPELINE=TIMESTAMP,SOURCE``,
docs/ESCAPE-HATCHES.md:193-199). Here: two dicts mapping names to
Pipeline fragments / writer callables, same missing-key contract.
"""

from __future__ import annotations

import logging
from collections.abc import Callable

from pyspark.sql import DataFrame

from kpipe_spark.pipeline.pipeline import Pipeline

log = logging.getLogger(__name__)


class PipelineRegistry:
    def __init__(self) -> None:
        self._operators: dict[str, Pipeline] = {}
        self._sinks: dict[str, Callable[[DataFrame], None]] = {}
        self._warned: set[str] = set()

    # -- operators -----------------------------------------------------------

    def register_operator(self, name: str, fragment: Pipeline) -> None:
        self._operators[name] = fragment

    def register_operators(self, fragments: dict[str, Pipeline]) -> None:
        """Bulk registration (registerEnum analogue,
        MessageProcessorRegistry.java:154-160)."""
        self._operators.update(fragments)

    def operator(self, name: str) -> Pipeline:
        """Missing key => warn once, identity passthrough
        (MessageProcessorRegistry.java:169-182)."""
        frag = self._operators.get(name)
        if frag is None:
            if name not in self._warned:
                log.warning("unknown operator %r — identity passthrough", name)
                self._warned.add(name)
            return Pipeline()
        return frag

    def pipeline(self, *names: str) -> Pipeline:
        """Compose registered fragments left-to-right by name."""
        out = Pipeline()
        for n in names:
            out = out.compose(self.operator(n))
        return out

    def pipeline_from_config(
        self, spec: str | None = None, env_var: str = "PROCESSOR_PIPELINE"
    ) -> Pipeline:
        """Config-driven assembly: a comma-separated operator list from
        a string or environment variable (``PROCESSOR_PIPELINE=
        TIMESTAMP,SOURCE``, docs/ESCAPE-HATCHES.md:193-199). Unknown
        names follow the warn-once identity contract, so a typo'd config
        degrades to passthrough instead of failing the deploy."""
        import os

        raw = spec if spec is not None else os.environ.get(env_var, "")
        names = [n.strip() for n in raw.split(",") if n.strip()]
        return self.pipeline(*names)

    # -- sinks ----------------------------------------------------------------

    def register_sink(self, name: str, writer: Callable[[DataFrame], None]) -> None:
        self._sinks[name] = writer

    def sink(self, name: str) -> Callable[[DataFrame], None]:
        """Missing sink => warn once, drop-sink (MessageProcessorRegistry.java:237-306)."""
        w = self._sinks.get(name)
        if w is None:
            if name not in self._warned:
                log.warning("unknown sink %r — records dropped", name)
                self._warned.add(name)
            return lambda df: None
        return w

    def composite_sink(self, *names: str) -> Callable[[DataFrame], None]:
        """Best-effort fan-out: every sink invoked; a throwing sink is
        logged and suppressed (CompositeMessageSink.java:11-33,
        docs/GUARANTEES.md:56)."""
        writers = [self.sink(n) for n in names]

        def write(df: DataFrame) -> None:
            for n, w in zip(names, writers):
                try:
                    w(df)
                except Exception:  # noqa: BLE001 — best-effort contract
                    log.exception("sink %r failed — suppressed (best-effort)", n)

        return write
