"""Atomic multi-table commit: one transaction spanning several manifests.

The single-table commit is already atomic (temp + ``os.replace`` of one
JSON, state/manifest.py).  When one epoch must publish TWO tables — the
live transcript table and a derived sibling (e.g. the covering index) —
two independent renames leave a crash window where readers see the tables
at different epochs.  ``TxnLog`` closes it with a write-ahead protocol:

1. every table's manifest record is written to its STAGED path
   (``_manifest/.staged-epoch=EEEEEE.json`` — atomic, invisible to
   ``committed_epochs``);
2. ONE transaction record ``_txn/txn-EEEEEE.json`` listing the
   participating manifest directories is atomically renamed into place —
   THE cross-table commit point;
3. each staged manifest is promoted (``os.replace`` → ``epoch=E.json``);
4. the transaction record is unlinked.

Crash analysis (each step is a single atomic rename):
* before 2 — no transaction happened; orphaned staged files are
  overwritten when the epoch replays (their data files are re-staged
  byte-identical, same as the single-table protocol);
* between 2 and 4 — the transaction IS committed; ``recover()`` rolls
  FORWARD by re-running step 3 (idempotent: a manifest already promoted
  is skipped) and then unlinks the record;
* after 4 — nothing to do.

``recover()`` runs from paths alone (no live engine needed) so a fresh
process heals an interrupted commit before reading ``committed_epochs``.

Reference analog: the two-phase "stage then flip one pointer" shape of
the repo's own manifest generalizes the reference's idempotent per-table
sync (/root/reference/orchestration/templates/ingest-processed-data.yaml:
7-12) — the reference syncs tables one at a time with no cross-table
atomicity (parallelism: 1 table loop); this is the lakehouse-grade
multi-table transaction it lacks.
"""

from __future__ import annotations

import json
import os
import re
import tempfile

from encode_ingest_ray.state.manifest import Manifest

_TXN_RE = re.compile(r"txn-(\d+)\.json$")


class TxnLog:
    def __init__(self, root: str):
        self.dir = os.path.join(root, "_txn")
        os.makedirs(self.dir, exist_ok=True)

    def _record_path(self, epoch: int) -> str:
        return os.path.join(self.dir, f"txn-{epoch:06d}.json")

    def commit(
        self,
        epoch: int,
        manifests: dict[str, Manifest],
        records: dict[str, dict],
        epochs: dict[str, int] | None = None,
    ) -> None:
        """Atomically commit across every manifest in ``manifests``.
        ``records[name]`` holds the kwargs for ``Manifest.stage``
        (partitions / metrics / partitioning).  Every manifest commits at
        ``epoch`` unless ``epochs[name]`` overrides it — sibling tables
        with INDEPENDENT epoch counters (e.g. the payload-file registry)
        still publish atomically with the live table."""
        eps = {name: (epochs or {}).get(name, epoch) for name in manifests}
        for name, man in manifests.items():
            man.stage(eps[name], **records[name])
        rec = {
            "epoch": epoch,
            "epochs": eps,
            "manifest_dirs": {name: man.dir for name, man in manifests.items()},
        }
        fd, tmp = tempfile.mkstemp(dir=self.dir, prefix=".tmp-txn-")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(rec, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self._record_path(epoch))  # commit point
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        for name, man in manifests.items():
            man.publish(eps[name])
        os.unlink(self._record_path(epoch))

    def recover(self) -> int:
        """Roll forward any transaction committed but not fully published
        (crash between the record rename and the last manifest promotion).
        Returns the number of transactions healed.  Safe to call always —
        an empty log is a no-op."""
        healed = 0
        for name in sorted(os.listdir(self.dir)):
            m = _TXN_RE.search(name)
            if m is None:
                continue
            with open(os.path.join(self.dir, name)) as f:
                rec = json.load(f)
            epoch = int(rec["epoch"])
            eps = rec.get("epochs") or {}
            for mname, mdir in rec["manifest_dirs"].items():
                e = int(eps.get(mname, epoch))
                staged = os.path.join(mdir, f".staged-epoch={e:06d}.json")
                final = os.path.join(mdir, f"epoch={e:06d}.json")
                if os.path.exists(staged):
                    os.replace(staged, final)
                elif not os.path.exists(final):
                    raise RuntimeError(
                        f"txn record {name} references epoch {e} of "
                        f"{mdir!r} but neither staged nor committed manifest "
                        "exists — staging is write-ahead, so this indicates "
                        "external file loss"
                    )
            os.unlink(os.path.join(self.dir, name))
            healed += 1
        return healed
