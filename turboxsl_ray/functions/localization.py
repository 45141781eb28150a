"""Localization lookup: the reference's ``ltr:__l`` / ``ltr:__ln``
(gettext .po catalogs with per-language plural rules and ``{name}``
templating, /root/reference/src/functions.c:1175-1286,
localization.c:37-85 (plural fns), :113-223 (catalog load)).

Re-expressed as the broadcast-small-side pattern: the catalog is a
plain dict shipped once (``ray.put`` for map_batches stages, or plain
closure capture for small catalogs), looked up vectorized per batch.
Plural-rule formulas mirror localization.c:37-85: English-style
(n != 1), French-style (n > 1), and the 3-form Russian/Slavic rule.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from turboxsl_ray.functions.registry import register
from turboxsl_ray.kernels.arrays import as_array


def plural_en(n: np.ndarray) -> np.ndarray:
    """0 = singular, 1 = plural (localization.c: germanic rule)."""
    return (n != 1).astype(np.int64)


def plural_fr(n: np.ndarray) -> np.ndarray:
    return (n > 1).astype(np.int64)


def plural_ru(n: np.ndarray) -> np.ndarray:
    """3-form Slavic rule (localization.c russian plural fn):
    form 0: n%10==1 && n%100!=11; form 1: n%10 in 2..4 && n%100 not in
    12..14; form 2: otherwise."""
    n10, n100 = n % 10, n % 100
    out = np.full(len(n), 2, dtype=np.int64)
    out[(n10 >= 2) & (n10 <= 4) & ~((n100 >= 12) & (n100 <= 14))] = 1
    out[(n10 == 1) & (n100 != 11)] = 0
    return out


PLURAL_RULES = {"en": plural_en, "de": plural_en, "fr": plural_fr, "ru": plural_ru}


class Catalog:
    """A message catalog for one language: msgid -> translation(s).

    Plural entries store a list of forms (indexed by the language's
    plural rule); singular entries a plain string. ``{name}``
    placeholders are substituted per row (functions.c's {name}
    templating)."""

    def __init__(self, lang: str, messages: dict):
        self.lang = lang
        self.messages = messages
        self.rule = PLURAL_RULES.get(lang, plural_en)

    def gettext(self, msgid_arr, **subs) -> pa.Array:
        """ltr:__l: vectorized msgid -> translation (missing → msgid)."""
        ids = as_array(msgid_arr).to_pylist()
        out = []
        for m in ids:
            t = self.messages.get(m, m)
            if isinstance(t, list):
                t = t[0]
            for k, v in subs.items():
                t = t.replace("{" + k + "}", str(v))
            out.append(t)
        return pa.array(out, type=pa.string())

    def ngettext(self, msgid_arr, counts) -> pa.Array:
        """ltr:__ln: plural-aware lookup; '{n}' substituted per row."""
        ids = as_array(msgid_arr).to_pylist()
        n = np.asarray(
            counts.to_numpy(zero_copy_only=False)
            if isinstance(counts, (pa.Array, pa.ChunkedArray))
            else counts,
            dtype=np.int64,
        )
        forms = self.rule(n)
        out = []
        for m, f, cnt in zip(ids, forms, n):
            t = self.messages.get(m, m)
            if isinstance(t, list):
                t = t[min(int(f), len(t) - 1)]
            out.append(t.replace("{n}", str(int(cnt))))
        return pa.array(out, type=pa.string())


def load_po(text: str, lang: str) -> Catalog:
    """Minimal .po parser (msgid / msgstr / msgid_plural / msgstr[i]),
    the subset localization.c:113-223 reads."""
    messages: dict = {}
    cur_id = None
    cur_plural: list[str] | None = None
    for raw in text.splitlines():
        line = raw.strip()
        if line.startswith("msgid_plural"):
            continue
        if line.startswith("msgid "):
            cur_id = line[6:].strip().strip('"')
            cur_plural = None
        elif line.startswith("msgstr[") and cur_id is not None:
            idx = int(line[7 : line.index("]")])
            val = line.split(" ", 1)[1].strip().strip('"')
            if cur_plural is None:
                cur_plural = []
                messages[cur_id] = cur_plural
            while len(cur_plural) <= idx:
                cur_plural.append("")
            cur_plural[idx] = val
        elif line.startswith("msgstr ") and cur_id is not None:
            messages[cur_id] = line[7:].strip().strip('"')
    return Catalog(lang, messages)


def _builtin_l(msgid_arr, catalog: Catalog, **subs):
    return catalog.gettext(msgid_arr, **subs)


def _builtin_ln(msgid_arr, counts, catalog: Catalog):
    return catalog.ngettext(msgid_arr, counts)


register("ltr:__l", _builtin_l, builtin=True)
register("ltr:__ln", _builtin_ln, builtin=True)
