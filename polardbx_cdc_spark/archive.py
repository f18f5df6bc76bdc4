"""Binlog archive store: upload, time-indexed selection, verified fetch.

The reference archives completed binlog files to object storage and, on
point-in-time recovery or a lagging replica, downloads the minimal file
set covering the requested position before switching to the live stream
(rpl/extractor/RdsBinlogExtractor.java — remote OSS file list + a
BinlogUrlDownloader that batches downloads and then hands the local
files to the parser; dumper-side upload of rotate-complete files).

Spark disposition: the "object store" is any shared filesystem path; an
``_index.json`` holds one entry per archived file — (name, size,
sha256, first/last commit TSO) — so selection is an index lookup, never
a byte scan. Upload is atomic (temp + rename) and content-addressed by
checksum; fetch verifies the checksum and supports resume from a
partial ``.part`` file (BinlogUrlDownloader's retry/continue behavior).
The archived bytes are the REAL wire files (binlog_wire), so
``read_wire_binlog``/flashback attach directly to a fetched set.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


class BinlogArchive:
    """A directory-backed binlog archive with a TSO-range index."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- index ----------------------------------------------------------
    def _index_path(self) -> str:
        return os.path.join(self.root, "_index.json")

    def index(self) -> dict[str, dict]:
        try:
            with open(self._index_path()) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return {}

    def _store_index(self, idx: dict[str, dict]) -> None:
        tmp = self._index_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(idx, fh, sort_keys=True)
        os.replace(tmp, self._index_path())

    # -- upload ---------------------------------------------------------
    def upload(self, local_path: str, first_tso: str, last_tso: str) -> dict:
        """Archive one rotate-complete wire file. Atomic (temp+rename),
        idempotent by content: re-uploading identical bytes is a no-op;
        different bytes under the same name raise (archives are
        immutable — the dumper never rewrites a rotated file)."""
        name = os.path.basename(local_path)
        digest = _sha256(local_path)
        idx = self.index()
        if name in idx:
            if idx[name]["sha256"] == digest:
                return idx[name]
            raise ValueError(f"archive {name} exists with different content")
        dst = os.path.join(self.root, name)
        tmp = dst + ".uploading"
        shutil.copyfile(local_path, tmp)
        os.replace(tmp, dst)
        entry = {
            "name": name,
            "size": os.path.getsize(dst),
            "sha256": digest,
            "first_tso": first_tso,
            "last_tso": last_tso,
        }
        idx[name] = entry
        self._store_index(idx)
        return entry

    def upload_wire_dir(self, wire_dir: str, spark=None) -> list[dict]:
        """Archive every rotate-complete wire file in a directory,
        deriving each file's TSO cover from its GCN events (the commit
        TSO physical prefix the exporter embeds). The LAST file in the
        chain (no ROTATE successor) is skipped — it is still being
        written, the reference's upload rule."""
        from polardbx_cdc_spark import binlog_wire as W

        names = sorted(
            f for f in os.listdir(wire_dir)
            if f.startswith("binlog.") and not f.endswith((".tmp", ".part"))
        )
        out = []
        for i, name in enumerate(names):
            if i == len(names) - 1:
                break  # open tail file — never archived
            evs = W.read_binlog_file(os.path.join(wire_dir, name))
            gcns = [e["gcn"] for e in evs if e["type"] == W.GCN_EVENT]
            first = f"{min(gcns):019d}" if gcns else ""
            last = f"{max(gcns):019d}" if gcns else ""
            out.append(self.upload(os.path.join(wire_dir, name), first, last))
        return out

    # -- selection ------------------------------------------------------
    def select_covering(self, from_tso: str, to_tso: str) -> list[dict]:
        """Minimal archived set whose [first_tso, last_tso] ranges
        intersect the requested window — pure index arithmetic, zero
        byte reads (the recovery planner's file list). TSO prefixes
        compare lexicographically like full TSOs."""
        fp, tp = from_tso[:19], to_tso[:19]
        picked = [
            e for e in self.index().values()
            if e["first_tso"] and e["last_tso"]
            and not (e["last_tso"] < fp or e["first_tso"] > tp)
        ]
        return sorted(picked, key=lambda e: e["name"])

    # -- fetch ----------------------------------------------------------
    def fetch(self, name: str, dest_dir: str) -> str:
        """Download one archived file with checksum verification and
        resume: an interrupted fetch leaves ``<name>.part``; the next
        call continues from its length (the src is read from that
        offset), then the completed file must hash-match the index or
        the fetch fails and the partial is discarded."""
        entry = self.index().get(name)
        if entry is None:
            raise FileNotFoundError(f"not archived: {name}")
        os.makedirs(dest_dir, exist_ok=True)
        final = os.path.join(dest_dir, name)
        if os.path.exists(final) and _sha256(final) == entry["sha256"]:
            return final  # already fetched and intact
        part = final + ".part"
        offset = os.path.getsize(part) if os.path.exists(part) else 0
        src = os.path.join(self.root, name)
        with open(src, "rb") as rf, open(part, "ab") as wf:
            rf.seek(offset)
            shutil.copyfileobj(rf, wf, 1 << 20)
        if _sha256(part) != entry["sha256"]:
            os.remove(part)
            raise ValueError(f"checksum mismatch fetching {name}")
        os.replace(part, final)
        return final

    def fetch_covering(self, from_tso: str, to_tso: str, dest_dir: str) -> list[str]:
        """Recovery entry point: select + fetch the minimal set for a
        TSO window. The fetched directory is directly readable by
        ``binlog_wire.read_wire_binlog`` (and seekable by GCN time) —
        archived history and the live stream unify with the same
        ``unionByName`` the backfill query uses."""
        return [self.fetch(e["name"], dest_dir) for e in self.select_covering(from_tso, to_tso)]
