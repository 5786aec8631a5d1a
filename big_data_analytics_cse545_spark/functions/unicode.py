"""Unicode normalization kernel — the suite's one justified
Python-boundary scalar function (Spark has no NFC builtin; DuckDB's
``nfc_normalize`` implements the same Unicode spec, which is what makes
t19's EXACT value-hash oracle possible).

Single definition shared by ``operators.text.t19_unicode_normalize``
and ``api.nfc_normalize`` so the two call sites cannot drift.
"""

# NOTE: deliberately NO `from __future__ import annotations` here — it
# would stringify the kernel's inline hints and break pandas_udf's
# eval-type inference, which is also why the annotations are assigned
# as real class objects below.


def nfc_udf():
    """Build the Arrow-batched NFC normalization ``pandas_udf``
    (string → string, None-preserving). A narrow per-row kernel: no
    shuffle, pipelines with the scan; the Arrow batch transfer is the
    only cost over a JVM expression."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _nfc_kernel(s):
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    _nfc_kernel.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_nfc_kernel, "string")
