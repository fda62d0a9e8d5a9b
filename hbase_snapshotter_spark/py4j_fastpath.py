"""Memoize py4j's static reflection lookups (r13 §10 — guide §1.2).

Plan construction in PySpark's classic (py4j) mode spends most of its
wall in gateway round-trips (cProfile: ~90 % of build time is
``socket.recv_into`` under ``send_command``; ~2 000 round-trips for one
wide-suite build).  Three of those round-trips repeat for EVERY
``F.<fn>(...)`` call:

1. ``getattr(sc._jvm, "org.apache.spark.sql.functions")`` —
   ``JVMView.__getattr__`` sends a REFLECTION command and builds a new
   ``JavaClass`` every time;
2. ``getattr(JavaClass, name)`` — ``JavaClass.__getattr__`` sends a
   second REFLECTION command and builds a new static ``JavaMember``;
3. the actual function invocation (CALL) — the only one that does work.

The same shape repeats for ``lit``/``col``
(``_create_column_from_literal/_name``) and for ``PythonUtils.toSeq``
in ``_to_seq`` — i.e. for nearly every Column/DataFrame API call.

The reflection results are STATIC: a JVM view's resolution of a class
name and a class's static-member handle never change for the life of
the gateway (``java_import`` only ADDS imports; successful resolutions
stay valid).  So this module caches them in the instances' own
``__dict__`` — Python then bypasses ``__getattr__`` entirely on the
next access, and every ``F.*`` call costs exactly ONE round-trip (the
call itself).  Nothing about WHAT is invoked changes: same JVM
methods, same arguments, same results, same plans.

What is (deliberately) NOT cached:

- ``JavaPackage`` results — py4j answers SUCCESS_PACKAGE for any name
  it cannot resolve (there is no error path), so a package result is a
  *guess*, not a resolution: a name accessed before a later
  ``java_import``/``ADD JAR`` would stay frozen as a stale package
  instead of re-resolving to the new ``JavaClass``.  Only definite
  ``JavaClass`` results are memoized; package-chain hops re-resolve
  every time (they are not on the hot ``F.*``/lit/col path).
- ``JavaClass`` FIELD reads (answer type field/value) — a static field
  can be mutable; only method members and nested classes are cached.
- ``JavaObject`` attribute access — py4j already caches per-instance
  method members without a round-trip (``auto_field`` is False in
  PySpark's gateway), so there is nothing to win.
- Failed resolutions — exceptions propagate uncached, so names that
  become importable later still resolve.

Gateway restarts are safe by construction: ``sc._jvm`` is a NEW
``JVMView`` after a restart, so its instance cache starts empty, and
cached handles on dead views/classes die with the objects that hold
them (the handles hold no JVM-side state — they address statics by
fully-qualified name).

Kill-switch: set ``SPARK_GRAFT_PY4J_CACHE=0`` before import to skip
installation (used for A/B measurement).
"""

from __future__ import annotations

import os

_installed = False


def install() -> bool:
    """Idempotently patch py4j's reflection lookups with instance-dict
    memoization.  Returns True when the patch is (already) active."""
    global _installed
    if _installed:
        return True
    if os.environ.get("SPARK_GRAFT_PY4J_CACHE", "1") == "0":
        return False

    try:
        from py4j.java_gateway import (
            JavaClass, JavaMember, JavaPackage, JVMView,
        )
    except ImportError:
        # py4j-less client (e.g. Spark Connect-only pyspark): nothing
        # to patch and nothing to win — plans build without a gateway.
        return False

    jvmview_orig = JVMView.__getattr__
    javaclass_orig = JavaClass.__getattr__
    javapackage_orig = JavaPackage.__getattr__

    def jvmview_getattr(self, name):
        value = jvmview_orig(self, name)
        # A JavaClass answer is a definite reflection SUCCESS and
        # stable for the life of the gateway.  A JavaPackage answer is
        # py4j's fallback for ANY unresolved name (SUCCESS_PACKAGE, no
        # error path) and must stay uncached so a later java_import /
        # ADD JAR re-resolves it to the real class.
        if isinstance(value, JavaClass):
            self.__dict__[name] = value
        return value

    def javaclass_getattr(self, name):
        value = javaclass_orig(self, name)
        # Static METHOD members and nested classes are immutable
        # handles; static FIELD reads (concrete values) are returned
        # uncached so mutable statics stay live.
        if isinstance(value, (JavaMember, JavaClass)):
            self.__dict__[name] = value
        return value

    def javapackage_getattr(self, name):
        value = javapackage_orig(self, name)
        # Same rule: only definite class resolutions are memoized;
        # sub-package hops (which are unverified guesses) re-resolve.
        if isinstance(value, JavaClass):
            self.__dict__[name] = value
        return value

    JVMView.__getattr__ = jvmview_getattr
    JavaClass.__getattr__ = javaclass_getattr
    JavaPackage.__getattr__ = javapackage_getattr
    _installed = True
    return True
