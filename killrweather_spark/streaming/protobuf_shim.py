"""Vendored-protobuf enablement for ``transformWithStateInPandas``.

Spark 4's arbitrary-state API speaks a protobuf state-server protocol:
every Python worker imports ``pyspark.sql.streaming.proto.StateMessage_pb2``,
which needs the ``google.protobuf`` runtime.  This container has no
installed protobuf and no network (``pip download protobuf`` returns
nothing), but the Google Cloud SDK ships a pure-Python protobuf runtime
(6.32.0) one minor version behind Spark's gencode (6.33.0).

:func:`enable_vendored_protobuf` makes that runtime visible to the driver
AND to every spawned Python worker:

- a shim directory under ``$TMPDIR`` gets a ``google`` symlink into the
  SDK's namespace package plus a ``sitecustomize.py`` that no-ops the
  gencode/runtime version validator (the 6.33-gencode/6.32-runtime skew
  is one minor version; the wire format is stable across it, and the
  state messages use no 6.33-only feature — verified by running the
  round-trip test end-to-end);
- the shim dir is prepended to ``PYTHONPATH`` so workers inherit it
  (``sitecustomize`` is imported at interpreter startup of every spawned
  worker — a driver-side monkeypatch alone leaves the worker crashing
  with "TransformWithStateInPySpark driver worker exited unexpectedly");
- the same patch is applied in-process for the driver.

MUST run before the JVM is launched (the gateway snapshots the driver's
environment); the test conftest calls it at import time.  A real
``google.protobuf`` install short-circuits all of this.
"""

from __future__ import annotations

import os
import sys
import tempfile

# Known locations of a complete, public, pure-Python google.protobuf
# runtime in this container (namespace-package layout: <dir>/google/protobuf).
VENDOR_CANDIDATES = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
]

_SITECUSTOMIZE = '''\
"""Sandbox shim written by killrweather_spark.streaming.protobuf_shim.

Present on PYTHONPATH only when the interpreter that launched Spark had
no installed google.protobuf: the `google` symlink next to this file
supplies the Cloud SDK's vendored pure-Python runtime to every spawned
Python worker, and the validator no-op below accepts the one-minor
gencode/runtime skew (Spark gencode 6.33 vs vendored runtime 6.32 --
wire-format stable; the TWS round-trip test exercises it end-to-end).
"""
try:
    from google.protobuf import runtime_version as _rv
    _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
except Exception:
    pass
'''


def _relax_validator() -> None:
    from google.protobuf import runtime_version as rv

    rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None


def enable_vendored_protobuf() -> tuple[str, str]:
    """Return ``(status, detail)``.

    - ``("native", version)`` — a real install exists, nothing to do;
    - ``("vendored", path)`` — the shim is active for this process and
      (via PYTHONPATH + sitecustomize) for all workers spawned by a JVM
      launched after this call;
    - ``("failed", error)`` — a vendor candidate exists but could not be
      made to work (the concrete exception, for the skip message);
    - ``("absent", detail)`` — no vendored runtime anywhere and no
      network to install one.
    """
    try:
        import google.protobuf as pb

        return ("native", getattr(pb, "__version__", "?"))
    except ImportError:
        pass

    for cand in VENDOR_CANDIDATES:
        gdir = os.path.join(cand, "google")
        if not os.path.isdir(os.path.join(gdir, "protobuf")):
            continue
        try:
            shim = os.path.join(tempfile.gettempdir(), "sg_protobuf_shim")
            os.makedirs(shim, exist_ok=True)
            link = os.path.join(shim, "google")
            if not os.path.islink(link) and not os.path.exists(link):
                os.symlink(gdir, link)
            sc = os.path.join(shim, "sitecustomize.py")
            if (not os.path.exists(sc)
                    or open(sc).read() != _SITECUSTOMIZE):
                with open(sc, "w") as f:
                    f.write(_SITECUSTOMIZE)
            os.environ["PYTHONPATH"] = (
                shim + os.pathsep + os.environ.get("PYTHONPATH", "")
            )
            if shim not in sys.path:
                sys.path.insert(0, shim)
            import google.protobuf  # noqa: F401  (now resolvable)

            _relax_validator()
            # smoke: the exact import every TWS worker performs
            from pyspark.sql.streaming.proto import (  # noqa: F401
                StateMessage_pb2,
            )

            return ("vendored", shim)
        except Exception as e:  # noqa: BLE001 — skip message wants the cause
            return ("failed", f"{type(e).__name__}: {e}")

    return (
        "absent",
        "no installed google.protobuf, no vendored runtime at "
        + " / ".join(VENDOR_CANDIDATES)
        + ", and pip install/download is network-blocked in this container",
    )
