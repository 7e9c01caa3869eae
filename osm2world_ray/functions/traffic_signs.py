"""TrafficSignIdentifier parsing — Java-exact semantics, vectorized.

Reference: ``core/.../traffic_sign/TrafficSignIdentifier.java:18-135``
(mirrored tests: ``TrafficSignIdentifierTest.java:13-42``):

- ``parseTrafficSignValue`` (``:99-133``): empty -> no ids; a value
  containing ``:`` splits ONCE into (country, rest) — the country can
  therefore contain ``;`` (Java ``split(":", 2)``); rest splits on
  ``[;,]`` with Java split's TRAILING-empty drop; each piece is
  space-trimmed.
- bracket text (``:34-44``): first ``\\[`` through LAST ``]`` (the
  greedy ``\\[(.*)\\]`` find), removed from the sign.
- ``subType`` (``:59-69``): full-match ``\\d*-(\\d+)[A-Za-z]*`` only.
- ``configKey`` (``:76-88``): ``SIGN_`` + country (verbatim case) +
  ``_`` + upper(sign with ``-`` -> ``_``).
- ``configKeyWithoutSubType`` (``:94-100``): removes EVERY occurrence
  of ``_<subType>`` from the config key (``String.replace`` literal
  semantics — a type that starts with the sub-type's digits loses that
  prefix too; ``np.char.replace`` reproduces the same left-to-right
  non-overlapping scan).

The batch kernel is Arrow/numpy end to end: ``np.char.partition`` for
the one-shot country split, Arrow ``split_pattern_regex`` + offsets for
the sign explode, segmented reversed-cumsum for the trailing-empty
drop, ``extract_regex``/``replace_substring_regex`` for brackets and
sub-types. No Python-level per-row loop.

Supported input scope (two corners deliberately narrower than Java,
both unreachable with well-formed tag values): a value whose rest part
is EMPTY after the country split (``"DE:"``) yields no ids here, where
Java's ``"".split`` would yield one empty-sign identifier (configKey
``SIGN_DE_``); and piece trimming strips ' ' only, where Java
``String.trim`` strips every char <= U+0020 (tabs/control chars inside
a piece are kept verbatim).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------------------
# scalar reference (pytest oracle; mirrors the Java line by line)
# ---------------------------------------------------------------------------

_BRACKET = re.compile(r"\[(.*)\]")
_SUBTYPE = re.compile(r"^\d*-(\d+)[A-Za-z]*$")


def parse_traffic_sign_value(value: str | None) -> list[dict]:
    """Row-at-a-time reference of ``parseTrafficSignValue``."""
    if not value:
        return []
    if ":" in value:
        country, rest = value.split(":", 1)
    else:
        country, rest = None, value
    pieces = re.split(r"[;,]", rest)
    while pieces and pieces[-1] == "":  # Java split drops trailing empties
        pieces.pop()
    out = []
    for piece in pieces:
        sign_value = piece.strip(" ")
        m = _BRACKET.search(sign_value)
        bracket = m.group(1) if m else None
        sign = sign_value.replace(f"[{bracket}]", "") if m else sign_value
        ms = _SUBTYPE.match(sign)
        sub_type = ms.group(1) if ms else None
        key = "SIGN_" + (f"{country}_" if country is not None else "") + \
            sign.replace("-", "_").upper()
        key_wo = key.replace(f"_{sub_type}", "") if sub_type else key
        out.append(
            {
                "country": country,
                "sign": sign,
                "bracket_text": bracket,
                "sub_type": sub_type,
                "config_key": key,
                "config_key_wo": key_wo,
            }
        )
    return out


# ---------------------------------------------------------------------------
# vectorized batch kernel
# ---------------------------------------------------------------------------

def parse_signs_batch(doc_ids: np.ndarray,
                      values: pa.Array | pa.ChunkedArray) -> pa.Table:
    """(doc_id, traffic-sign tag value) columns -> exploded parsed rows
    (doc_id, sign_idx, country, sign, bracket_text, sub_type,
    config_key, config_key_wo); None fields surface as ''."""
    import pyarrow.compute as pc

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    vals = values.to_numpy(zero_copy_only=False).astype(str)
    nonempty = np.nonzero(np.char.str_len(vals) > 0)[0]
    doc_ids = np.asarray(doc_ids, dtype=np.int64)[nonempty]
    vals = vals[nonempty]
    # split(":", 2): one partition; country may contain ';'
    before, sep, after = np.char.partition(vals, ":").swapaxes(0, 1)
    has_c = sep == ":"
    country = np.where(has_c, before, "")
    rest = np.where(has_c, after, before)

    pieces = pc.split_pattern_regex(pa.array(rest), "[;,]")
    lens = pc.list_value_length(pieces).to_numpy().astype(np.int64)
    off = np.concatenate(([0], np.cumsum(lens)))
    flat = pieces.flatten()
    row = np.repeat(np.arange(len(rest), dtype=np.int64), lens)
    # Java split drops TRAILING empty pieces: keep a piece unless it is
    # empty and no non-empty piece follows it within its row
    raw_empty = pc.equal(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    c = np.concatenate(([0], np.cumsum(~raw_empty)))
    nonempty_after = c[off[1:]][row] - c[np.arange(len(raw_empty)) + 1]
    keep = ~(raw_empty & (nonempty_after == 0))
    kept = np.nonzero(keep)[0]
    flat = flat.take(pa.array(kept))
    row = row[kept]
    # per-row sign index after the drop
    first = np.ones(len(row), dtype=bool)
    first[1:] = row[1:] != row[:-1]
    starts = np.nonzero(first)[0]
    sizes = np.diff(np.concatenate((starts, [len(row)])))
    sign_idx = np.arange(len(row), dtype=np.int64) - np.repeat(starts, sizes)

    trimmed = pc.utf8_trim(flat, " ")
    br = pc.extract_regex(trimmed, r"\[(?P<b>.*)\]")
    has_br = pc.is_valid(br).to_numpy(zero_copy_only=False)
    bracket = np.where(
        has_br,
        pc.struct_field(br, "b").fill_null("").to_numpy(zero_copy_only=False),
        "",
    )
    sign = pc.replace_substring_regex(
        trimmed, pattern=r"\[.*\]", replacement="", max_replacements=1
    )
    st = pc.extract_regex(sign, r"^\d*-(?P<st>\d+)[A-Za-z]*$")
    has_st = pc.is_valid(st).to_numpy(zero_copy_only=False)
    sub_type = np.where(
        has_st,
        pc.struct_field(st, "st").fill_null("").to_numpy(zero_copy_only=False),
        "",
    ).astype(str)
    body = pc.utf8_upper(pc.replace_substring(sign, "-", "_")).to_numpy(
        zero_copy_only=False
    )
    country_r = country[row]
    prefix = np.where(
        has_c[row], np.char.add(np.char.add("SIGN_", country_r), "_"), "SIGN_"
    )
    key = np.char.add(prefix, body.astype(str))
    # String.replace("_"+subType, "") — np.char.replace reproduces the
    # left-to-right non-overlapping literal scan exactly
    key_wo = np.where(
        has_st, np.char.replace(key, np.char.add("_", sub_type), ""), key
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[row]),
            "sign_idx": pa.array(sign_idx),
            "country": pa.array(country_r.tolist(), type=pa.string()),
            "sign": pa.array(
                sign.to_numpy(zero_copy_only=False).tolist(), type=pa.string()
            ),
            "bracket_text": pa.array(bracket.tolist(), type=pa.string()),
            "sub_type": pa.array(sub_type.tolist(), type=pa.string()),
            "config_key": pa.array(key.tolist(), type=pa.string()),
            "config_key_wo": pa.array(key_wo.tolist(), type=pa.string()),
        }
    )
