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
Python worker, and the SCOPED validator relaxation below accepts only a
one-minor-version gencode/runtime skew within the same major (Spark
gencode 6.33 vs vendored runtime 6.32 -- wire-format stable; the TWS
round-trip test exercises it end-to-end).  Any other skew still goes
through the stock validator, so unrelated protobuf users in processes
inheriting this PYTHONPATH keep full validation.
"""
try:
    from google.protobuf import runtime_version as _rv

    _orig = _rv.ValidateProtobufRuntimeVersion

    def _scoped(gen_version, major, minor, patch, suffix, location,
                *a, **k):
        same_major = major == _rv.MAJOR
        one_minor_ahead = 0 <= (minor - _rv.MINOR) <= 1
        if same_major and one_minor_ahead:
            return None
        return _orig(gen_version, major, minor, patch, suffix,
                     location, *a, **k)

    _rv.ValidateProtobufRuntimeVersion = _scoped
except Exception:
    pass
'''


def _relax_validator() -> None:
    """Driver-side twin of the sitecustomize relaxation: accept ONLY a
    gencode one minor ahead of the vendored runtime within the same
    major; everything else keeps stock validation."""
    from google.protobuf import runtime_version as rv

    orig = rv.ValidateProtobufRuntimeVersion

    def _scoped(gen_version, major, minor, patch, suffix, location, *a, **k):
        if major == rv.MAJOR and 0 <= (minor - rv.MINOR) <= 1:
            return None
        return orig(gen_version, major, minor, patch, suffix, location,
                    *a, **k)

    rv.ValidateProtobufRuntimeVersion = _scoped


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
            # Per-user, 0700 shim dir: a fixed world-shared path would
            # let another local user pre-create the symlink /
            # sitecustomize.py and inject code into every worker.  The
            # path is keyed by uid and, if it already exists, must be a
            # real directory we own with no group/other write bits —
            # otherwise fall back to a fresh private mkdtemp.
            shim = os.path.join(
                tempfile.gettempdir(), f"sg_protobuf_shim_{os.getuid()}"
            )
            try:
                os.makedirs(shim, mode=0o700, exist_ok=False)
            except FileExistsError:
                st = os.lstat(shim)
                import stat as _stat

                if (
                    not _stat.S_ISDIR(st.st_mode)
                    or st.st_uid != os.getuid()
                    or st.st_mode & 0o022
                ):
                    shim = tempfile.mkdtemp(prefix="sg_protobuf_shim_")
            link = os.path.join(shim, "google")
            if os.path.islink(link) and os.readlink(link) != gdir:
                os.unlink(link)  # stale or foreign target — replace
            if not os.path.islink(link) and not os.path.exists(link):
                os.symlink(gdir, link)
            sc = os.path.join(shim, "sitecustomize.py")
            if (not os.path.exists(sc)
                    or open(sc).read() != _SITECUSTOMIZE):
                fd = os.open(sc, os.O_WRONLY | os.O_CREAT | os.O_TRUNC, 0o600)
                with os.fdopen(fd, "w") as f:
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
