"""webtext — a Ray-Data-native main-content extraction engine.

A from-scratch reimplementation of the extraction capabilities of
sakaki9900/WebText_extraction (reference at /root/reference, read-only)
as a streaming Ray Data pipeline over tables of interleaved text+media
documents: ``(doc_id, spans: list<struct<kind,text,media_ref,offset>>)``.

Layout:
  dom.py        minimal HTML DOM + CSS selector engine (no bs4 in env)
  oracle/       pure-Python extraction semantics (ground truth + actor core)
  schema.py     Arrow schemas for input/output/reject tables
  synth.py      deterministic fixture-corpus generator (FIXTURES.md)
  stages/       Ray Data stages (extraction actor pool, skew handling)
  sources/      table IO + commit manifest / resume
  pipelines/    end-to-end pipeline assembly
  functions/    corpus-level ops (dedup, ANN, text stats, media stubs)
"""

__version__ = "0.1.0"


def _register_portable_pickle() -> None:
    """Ship all webtext code to Ray workers BY VALUE.

    The driver that calls ray.init() may run from any cwd; Ray workers do
    not inherit driver-side sys.path mutations, so module-level callables
    pickled by reference (actor classes, partial-combiner functions, and
    the module-global helpers that closures capture) raise
    ``ModuleNotFoundError: webtext`` on deserialization — and an actor
    pool whose actors die at unpickle time stalls the streaming executor
    forever (observed: round-2 driver correctness run hung on the first
    actor stage and produced an empty artifact).  Registering every
    webtext module with Ray's vendored cloudpickle makes each shipped
    callable self-contained: no worker ever imports the package.
    Corollary: no webtext code that executes on a worker may do a lazy
    ``import webtext...`` / relative import at call time.
    """
    import importlib
    import os
    import pkgutil
    import sys

    if os.environ.get("WEBTEXT_PICKLE_BY_VALUE", "1") == "0":
        return  # A/B escape hatch for serialization-overhead measurement
    try:
        from ray import cloudpickle
    except ImportError:  # pragma: no cover - ray is a hard dep in practice
        return
    pkg = sys.modules[__name__]
    names = [__name__] + [
        m.name for m in pkgutil.walk_packages(pkg.__path__,
                                              prefix=__name__ + ".")
    ]
    for name in names:
        try:
            cloudpickle.register_pickle_by_value(
                importlib.import_module(name))
        except Exception:  # noqa: BLE001 - a CLI-only module must not
            pass           # break library import


_register_portable_pickle()
