"""MBOX mail-archive source — the 19th file format: list archives,
Google Takeout exports and decades of Unix mail spools ship as one
giant .mbox file holding thousands of RFC 5322 messages. The format
is trivial (messages concatenated, each introduced by a ``From ``
separator line; body lines that would start with ``From `` are
quoted ``>From `` — the mboxrd convention) but the FILE is the unit
real corpora deliver, and it is routinely multi-GB — so the reader
distributes ONE file across the cluster with the same two-pass
parallel scan as ``read_turtle_sharded``:

1. ``textFile`` splits the file into line blocks (input splits),
2. pass 1 counts separator lines per partition (one long each,
   collected + prefix-summed on the driver),
3. pass 2 labels every line with its global message id and its
   order-preserving (partition << 32 | ordinal) line number,
4. messages reassemble in the single bounded shuffle (groupBy
   message id, sort_array on the line number), un-quote mboxrd
   ``>From `` runs, and parse with the existing RFC 5322 reader
   (operators/eml.py) inside an Arrow stage.

Messages straddling input-split boundaries are exactly the case the
two-pass scan exists for — the fixture forces 8 splits so every
boundary cuts through a message. Reference analog: none (razulibs
holds no mail); engine-native surface.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_FROM_LINE = "From MAILER-DAEMON Thu Jan  1 00:00:00 1970"
_QUOTED_FROM_RE = re.compile(r"^(>+)From ", re.M)


def mbox_escape(message_text: str) -> str:
    """mboxrd quoting: any body/header line matching ``^>*From `` gains
    one more ``>`` so the bare separator can never occur inside a
    message."""
    return re.sub(r"^(>*)From ", r">\1From ", message_text, flags=re.M)


def mbox_unescape(message_text: str) -> str:
    """Inverse of mbox_escape: strip ONE leading ``>`` from every
    ``^>+From `` line."""
    return re.sub(r"^>((?:>*)From )", r"\1", message_text, flags=re.M)


def read_mbox_sharded(
    spark, path: str, min_partitions: int | None = None
) -> DataFrame:
    """One .mbox file → DataFrame(msg_id long, raw string) with each
    message's full RFC 5322 text (separator line stripped, mboxrd
    quoting undone), distributed across input splits. Lines before
    the first separator (a preamble, rare but legal) are dropped."""
    from pyspark.sql import functions as F

    from razulibs_spark.sources.sharded_text import separator_records

    recs = separator_records(
        spark, path,
        is_separator=lambda ln: ln.startswith("From "),
        min_partitions=min_partitions,
        keep_separator=False,  # the From_ line is framing, not content
    )
    return recs.select(
        F.col("rec_id").alias("msg_id"),
        F.regexp_replace(
            "rec", r"(?m)^>((?:>*)From )", r"$1"
        ).alias("raw"),
    )


def mbox_message_stats(messages: DataFrame) -> DataFrame:
    """(msg_id, raw) → the EML stats row per message, doc_id recovered
    from the message's own Subject (``Report <d> …``) so correctness
    does not depend on file order. Fail-closed per row."""
    import hashlib
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from razulibs_spark.operators.eml import parse_eml

    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("parsed", BooleanType(), False),
            StructField("subject_md5", StringType(), True),
            StructField("body_md5", StringType(), True),
            StructField("n_parts", LongType(), True),
            StructField("cte", StringType(), True),
            StructField("note", StringType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in schema.fields]
        for pdf in it:
            rows = []
            for msg_id, raw in zip(pdf["msg_id"], pdf["raw"]):
                try:
                    m = parse_eml(str(raw).encode("utf-8"))
                    subj = m["subject"]
                    d = int(subj.split(" ")[1])
                except (ValueError, IndexError) as exc:
                    # doc_id unrecoverable: sentinel row (negative id
                    # keyed by file position) — the oracle expects
                    # none, so any appearance is a visible mismatch
                    rows.append(
                        (-int(msg_id), False, None, None, None, None,
                         str(exc))
                    )
                    continue
                rows.append(
                    (
                        d, True,
                        hashlib.md5(subj.encode()).hexdigest(),
                        hashlib.md5(
                            (m["body"] or "").encode()
                        ).hexdigest(),
                        m["n_parts"], m["cte"], None,
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return messages.mapInPandas(batches, schema=schema)
