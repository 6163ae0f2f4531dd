"""Snapshot table layer: versioned, time-travelable tables over parquet.

A minimal lakehouse-style commit protocol (the moral core of what table
formats add on top of raw parquet; reference has nothing comparable —
`cae/README.md:137` is single-file):

- data files are immutable parquet parts under ``<path>/data/``,
- each commit writes a manifest ``<path>/v<N>.manifest.json`` listing the
  EXACT data files visible in that version,
- the manifest file is the atomic commit point (written to a temp name,
  then ``os.replace`` — readers either see the whole version or not),
- reads resolve a version's manifest and load ONLY its files, so
  concurrent appends never tear a read, and any historical version stays
  readable (time travel) until explicitly vacuumed.

Scale notes: manifests list files, not rows, so commit cost is O(files in
the delta); reads plan from the manifest file list (no directory listing
— the 100 TB win: object-store LIST is slow and eventually consistent).
Schema is pinned by the first commit and checked on append.
"""

from __future__ import annotations

import json
import re
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class ConcurrentCommitError(RuntimeError):
    """Another writer committed the same version first (optimistic
    concurrency): re-read and retry the operation."""


def _atomic_link_commit(payload: dict, final_path: str, err_msg: str) -> None:
    """Publish ``payload`` as JSON at ``final_path`` via a UNIQUE temp
    file + exclusive hard link. The temp name carries pid + uuid: a
    fixed shared ``<final>.tmp`` lets two racing writers truncate each
    other's scratch file, so the winner can publish the LOSER's bytes
    and the loser crashes with FileNotFoundError instead of the
    documented ConcurrentCommitError."""
    tmp = f"{final_path}.{os.getpid()}.{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1)
    try:
        os.link(tmp, final_path)
    except FileExistsError:
        os.remove(tmp)
        raise ConcurrentCommitError(err_msg) from None
    os.remove(tmp)


_REF_NAME = re.compile(r"[A-Za-z0-9_\-]{1,64}")


class SnapshotTable:
    def __init__(self, path: str, ref: str = "main"):
        """``ref`` selects the version line: "main" is the table's root
        manifest directory (the historical layout, fully
        back-compatible); any other name reads/commits manifests under
        ``refs/<ref>/`` — a BRANCH (Iceberg/Nessie-style named ref).
        Branches share the immutable ``data/`` parts with main and each
        other; only the manifest lines diverge, so branching is O(one
        manifest), not a copy."""
        if ref != "main" and not _REF_NAME.fullmatch(ref):
            raise ValueError(f"invalid ref name {ref!r}")
        self.path = path
        self.ref = ref
        self.data_dir = os.path.join(path, "data")

    # ------------------------------------------------------------- internals

    def _refs_dir(self) -> str:
        return os.path.join(self.path, "refs", self.ref)

    def _manifest_dir(self) -> str:
        return self.path if self.ref == "main" else self._refs_dir()

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._manifest_dir(), f"v{version}.manifest.json")

    def _versions(self) -> list[int]:
        d = self._manifest_dir()
        if not os.path.isdir(d):
            return []
        out = []
        for f in os.listdir(d):
            if f.startswith("v") and f.endswith(".manifest.json"):
                out.append(int(f[1:].split(".")[0]))
        return sorted(out)

    def _read_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def _commit(
        self,
        files: list[str],
        schema_json: str,
        parent: int | None,
        delete_files: list[dict] | None = None,
    ) -> int:
        version = (parent + 1) if parent is not None else 0
        os.makedirs(self._manifest_dir(), exist_ok=True)
        manifest = {
            "version": version,
            "parent": parent,
            "committed_at_unix": int(time.time()),
            "schema": schema_json,
            "files": sorted(files),
        }
        if delete_files:
            # merge-on-read equality deletes (Iceberg-v2 style): each
            # entry = {"file": <key parquet>, "keys": [...], "applies_to":
            # [data files present when the delete committed]} — sequencing
            # lives in applies_to, so later appends are unaffected.
            manifest["delete_files"] = delete_files
        # Exclusive link is the atomic commit: readers list only
        # *.manifest.json, and two writers racing for the same version
        # cannot both win — the loser gets ConcurrentCommitError
        # (optimistic concurrency, the Delta/Iceberg commit rule)
        # instead of silently overwriting the other's manifest.
        _atomic_link_commit(
            manifest,
            self._manifest_path(version),
            f"version {version} was committed by another writer; "
            "re-read the table and retry",
        )
        return version

    def _write_parts(self, df: DataFrame, tag: str) -> list[str]:
        """Write df as immutable parts into data/<tag>/ and return the
        parquet file names relative to the table root. Branch writes
        prefix the tag with the ref so two refs committing the same
        version number in one process cannot collide."""
        if self.ref != "main":
            tag = f"{self.ref}__{tag}"
        out_dir = os.path.join(self.data_dir, tag)
        df.write.mode("error").parquet(out_dir)
        return [
            os.path.join("data", tag, f)
            for f in os.listdir(out_dir)
            if f.endswith(".parquet")
        ]

    # ------------------------------------------------------------------- API

    def latest_version(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def append(self, df: DataFrame, allow_evolution: bool = False) -> int:
        """Commit a new version = parent's files + the new files.

        Schema is pinned by default. ``allow_evolution=True`` permits
        ADDING nullable columns: the manifest records the widened schema
        and reads project older files through it (missing columns read as
        NULL — the additive half of lakehouse schema evolution; renames/
        drops/retypes stay forbidden because they silently corrupt old
        files)."""
        parent = self.latest_version()
        schema_json = df.schema.json()
        if parent is not None:
            m = self._read_manifest(parent)
            if m["schema"] != schema_json:
                if not allow_evolution:
                    raise ValueError(
                        "append schema does not match table schema pinned at "
                        "v0 (pass allow_evolution=True to add columns)"
                    )
                import json as _json

                from pyspark.sql import types as T

                old = T.StructType.fromJson(_json.loads(m["schema"]))
                new = df.schema
                old_fields = {f.name: f for f in old.fields}
                for f in old.fields:
                    nf = next((x for x in new.fields if x.name == f.name), None)
                    if nf is None or nf.dataType != f.dataType:
                        raise ValueError(
                            f"evolution may only ADD columns; column "
                            f"{f.name!r} was changed or removed"
                        )
                # New columns are recorded nullable regardless of the
                # writer's nullability: older files have no values for
                # them, so every historical read yields NULLs there.
                widened = T.StructType(
                    list(old.fields)
                    + [
                        T.StructField(f.name, f.dataType, True)
                        for f in new.fields
                        if f.name not in old_fields
                    ]
                )
                schema_json = widened.json()
            prev_files = m["files"]
            prev_dvs = m.get("delete_files")
        else:
            prev_files = []
            prev_dvs = None
        tag = f"c{(parent + 1) if parent is not None else 0}_{os.getpid()}"
        files = self._write_parts(df, tag)
        # delete files carry forward untouched: their applies_to sets
        # exclude the files appended here, so new rows never anti-join
        return self._commit(
            prev_files + files, schema_json, parent, delete_files=prev_dvs
        )

    def overwrite(self, df: DataFrame) -> int:
        """Commit a new version containing ONLY the new files. Old versions
        keep their files — time travel still works."""
        parent = self.latest_version()
        tag = f"c{(parent + 1) if parent is not None else 0}_{os.getpid()}"
        files = self._write_parts(df, tag)
        return self._commit(files, df.schema.json(), parent)

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Read a version (default: latest) from its manifest's file list —
        no directory listing, stable against concurrent commits.

        Merge-on-read: if the manifest carries ``delete_files`` (equality
        deletes committed by ``delete_where`` — no data rewrite), each
        delete's key set is LEFT-ANTI-joined onto exactly the data files
        it ``applies_to`` — files appended AFTER the delete are read
        untouched, so re-inserting a deleted key behaves correctly
        (Iceberg v2 sequencing, expressed as explicit file sets). The
        delete key tables are tiny and broadcast."""
        from pyspark.sql import types as T

        if version is None:
            version = self.latest_version()
        if version is None:
            raise FileNotFoundError(f"no committed version at {self.path}")
        m = self._read_manifest(version)
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        if not m["files"]:
            return spark.createDataFrame([], schema)
        return _read_files_with_dvs(
            spark, self.path, m["files"], schema, m.get("delete_files", [])
        )

    def delete_where(
        self, spark: SparkSession, keys: list[str], predicate
    ) -> int:
        """Merge-on-read DELETE: write only the matching rows' KEYS as an
        equality-delete file and commit a manifest that carries the data
        files UNCHANGED — O(deleted keys) write instead of copy-on-write's
        rewrite of every touched file. ``read`` applies the deletes as
        broadcast anti-joins scoped to the files present now
        (``applies_to``); ``compact`` purges them physically; ``merge``
        keeps them scoped to the files it doesn't rewrite. The trade is
        the lakehouse MOR trade: cheap deletes, slightly heavier reads
        until the next compaction."""
        parent = self.latest_version()
        if parent is None:
            raise FileNotFoundError(f"nothing to delete from at {self.path}")
        m = self._read_manifest(parent)
        delkeys = (
            self.read(spark, parent)
            .where(predicate)
            .select(*keys)
            .distinct()
        )
        tag = f"d{parent + 1}_{os.getpid()}"
        # One entry per COMMIT carrying all its part files — the key set
        # writes with whatever parallelism the predicate scan had (a
        # billion-key delete must not funnel through one task), and the
        # reader anti-joins the union once per entry, not once per file.
        files = self._write_parts(delkeys, tag)
        entries = m.get("delete_files", []) + [
            {"files": files, "keys": list(keys), "applies_to": m["files"]}
        ]
        return self._commit(m["files"], m["schema"], parent, delete_files=entries)

    def rollback(self, version: int) -> int:
        """RESTORE: commit a NEW head whose content equals an earlier
        ``version`` — the Iceberg/Delta rollback verb. Nothing is deleted
        or rewritten: the new manifest re-points at the old version's
        files, schema, and delete-file entries verbatim, so the bad
        versions stay time-travelable, ``vacuum`` keeps the restored
        files referenced (its referenced set spans every surviving
        manifest), and rolling back a petabyte table writes one JSON
        file. Returns the new head version."""
        vs = self._versions()
        if version not in vs:
            raise ValueError(
                f"cannot rollback to v{version}: versions present are {vs}"
            )
        head = vs[-1]
        m = self._read_manifest(version)
        return self._commit(
            m["files"],
            m["schema"],
            head,
            delete_files=m.get("delete_files"),
        )

    def create_branch(
        self, name: str, from_version: int | None = None
    ) -> "SnapshotTable":
        """Create branch ``name`` at ``from_version`` (default: this
        ref's head): ONE new manifest under refs/<name>/ that carries
        the source version's files, schema, and delete files verbatim,
        plus a ``branched_from`` provenance record. Data is shared —
        branching a petabyte table writes one JSON file. The branch
        then evolves independently through the normal append / merge /
        delete_where / compact API; the atomic hard-link commit makes
        racing create_branch calls safe (one wins, the loser gets
        ConcurrentCommitError)."""
        if name == "main" or not _REF_NAME.fullmatch(name):
            raise ValueError(f"invalid branch name {name!r}")
        src_version = (
            from_version if from_version is not None else self.latest_version()
        )
        if src_version is None:
            raise FileNotFoundError(f"no committed version at {self.path}")
        m = self._read_manifest(src_version)
        br = SnapshotTable(self.path, ref=name)
        if br.latest_version() is not None:
            raise ValueError(f"branch {name!r} already exists")
        os.makedirs(br._manifest_dir(), exist_ok=True)
        manifest = {
            "version": 0,
            "parent": None,
            "committed_at_unix": int(time.time()),
            "schema": m["schema"],
            "files": m["files"],
            "branched_from": {"ref": self.ref, "version": src_version},
        }
        if m.get("delete_files"):
            manifest["delete_files"] = m["delete_files"]
        _atomic_link_commit(
            manifest,
            br._manifest_path(0),
            f"branch {name!r} was created by another writer",
        )
        return br

    def promote_branch(
        self, spark: SparkSession, name: str, keys: list[str]
    ) -> int:
        """Merge branch ``name``'s NET delta back into this ref — the
        experiment-promotion step of branch-based data engineering.
        The delta is the CDC between the branch's fork-point snapshot
        (its v0) and its head, computed by ``snapshot_diff`` over the
        branch's own manifest line (file-pruned: only files the branch
        actually wrote or dropped are scanned); inserts/updates upsert
        and deletes delete through the copy-on-write ``merge``, so only
        the keys the branch changed touch this ref's files. Keys the
        branch never touched merge cleanly even if this ref advanced
        since the fork; a conflicting same-key change is last-writer-
        wins by promotion order (the Nessie-style simple-ref model —
        detect-and-fail belongs to a rebase layer above this).
        Returns the new version on this ref."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        br = SnapshotTable(self.path, ref=name)
        head = br.latest_version()
        if head is None:
            raise FileNotFoundError(f"no branch {name!r} at {self.path}")
        if head == 0:
            raise ValueError(f"branch {name!r} has no commits to promote")
        diff = snapshot_diff(br, spark, 0, head, keys)
        schema = T.StructType.fromJson(
            json.loads(br._read_manifest(head)["schema"])
        )
        non_keys = [f.name for f in schema.fields if f.name not in keys]
        src_df = diff.select(
            *keys,
            *[F.col(f"new_values.{c}").alias(c) for c in non_keys],
            (F.col("change_op") == "delete").alias("__promote_del"),
        )
        return self.merge(
            spark, src_df, keys=keys, delete_col="__promote_del"
        )

    def branches(self) -> list[str]:
        """Names of all branches (refs other than main)."""
        d = os.path.join(self.path, "refs")
        if not os.path.isdir(d):
            return []
        return sorted(
            n for n in os.listdir(d)
            if os.path.isdir(os.path.join(d, n))
        )

    def tag_version(self, name: str, version: int | None = None) -> int:
        """Pin an IMMUTABLE named tag at ``version`` (default: this
        ref's head) — the audit/release pointer: a tag can never move,
        so re-tagging an existing name raises. Stored as one JSON under
        tags/ with the same atomic hard-link commit."""
        if not _REF_NAME.fullmatch(name):
            raise ValueError(f"invalid tag name {name!r}")
        v = version if version is not None else self.latest_version()
        if v is None:
            raise FileNotFoundError(f"no committed version at {self.path}")
        self._read_manifest(v)  # must exist on this ref
        tdir = os.path.join(self.path, "tags")
        os.makedirs(tdir, exist_ok=True)
        tpath = os.path.join(tdir, f"{name}.json")
        try:
            _atomic_link_commit(
                {"ref": self.ref, "version": v},
                tpath,
                f"tag {name!r} already exists (tags are immutable)",
            )
        except ConcurrentCommitError as e:
            raise ValueError(str(e)) from None
        return v

    def read_tag(self, spark: SparkSession, name: str) -> DataFrame:
        """Read the snapshot a tag pins, whatever ref it was taken on."""
        tpath = os.path.join(self.path, "tags", f"{name}.json")
        if not os.path.exists(tpath):
            raise FileNotFoundError(f"no tag {name!r} at {self.path}")
        with open(tpath) as f:
            t = json.load(f)
        return SnapshotTable(self.path, ref=t["ref"]).read(
            spark, t["version"]
        )

    def history(self) -> list[dict]:
        return [self._read_manifest(v) for v in self._versions()]

    def compact(
        self,
        spark: SparkSession,
        target_files: int = 1,
        zorder_cols: list[str] | None = None,
    ) -> int:
        """Rewrite the CURRENT version's data into ``target_files`` files and
        commit the result as a new version — the small-file remedy for
        tables built by many tiny appends (streaming sinks, incremental
        jobs). Logically a no-op: the new version holds identical rows;
        older versions keep reading their original files.

        ``zorder_cols`` makes this OPTIMIZE ZORDER BY: the rewrite is
        clustered on the Morton key of the given (numeric/timestamp)
        columns via ``writer.write_zordered(normalize=True)``, so row-group
        stats stay tight on every listed dimension — compaction and
        multi-dimensional clustering in one pass, the Delta/Iceberg
        maintenance pattern."""
        parent = self.latest_version()
        if parent is None:
            raise FileNotFoundError(f"nothing to compact at {self.path}")
        df = self.read(spark, parent)
        tag = f"compact{parent + 1}_{os.getpid()}"
        out_dir = os.path.join(self.data_dir, tag)
        if zorder_cols:
            from .writer import write_zordered

            write_zordered(
                df,
                out_dir,
                zorder_cols,
                bits=12,
                num_files=target_files,
                mode="error",
                normalize=True,
            )
            files = [
                os.path.join("data", tag, f)
                for f in os.listdir(out_dir)
                if f.endswith(".parquet")
            ]
        else:
            files = self._write_parts(df.coalesce(target_files), tag)
        return self._commit(files, self._read_manifest(parent)["schema"], parent)

    def merge(
        self,
        spark: SparkSession,
        source: DataFrame,
        keys: list[str],
        delete_col: str | None = None,
    ) -> int:
        """Copy-on-write MERGE (the lakehouse upsert): source rows replace
        target rows with the same key, unmatched source rows are inserted,
        and rows whose source row has ``delete_col`` true are removed.

        Only data files that actually CONTAIN a matched key are rewritten;
        every untouched file carries over into the new manifest by
        reference — at 100 TB a merge touching 0.1% of keys rewrites
        ~0.1% of files, not the table. The touched-file discovery is a
        semi join on ``input_file_name()`` (one pass over the target,
        filter-pushed on nothing but cheap: only key columns + the file
        name are read); the rewrite is a left-anti + union of the touched
        rows. Time travel is preserved: the parent version still reads its
        original files.

        Contract: ``source`` must be unique per key (the classic MERGE
        precondition — enforced here with a cheap count check so ambiguous
        merges fail loudly instead of nondeterministically).
        """
        from pyspark.sql import functions as F

        parent = self.latest_version()
        if parent is None:
            raise FileNotFoundError(f"nothing to merge into at {self.path}")
        m = self._read_manifest(parent)

        dup = (
            source.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError("merge source has duplicate keys")

        # Manifest-relative file name, derived executor-side from
        # input_file_name(): the URI's suffix after the table root. Keeping
        # everything in relative-name space means (a) the only driver
        # round-trip is a distinct list of short names bounded by the
        # manifest size the driver already holds — never full URIs of
        # millions of files — and (b) the touched-row rewrite is a
        # distributed semi join, not a giant IN-list expression.
        marker = self.path.rstrip("/") + "/"
        from pyspark.sql import types as T

        cur = _read_files_with_dvs(
            spark,
            self.path,
            m["files"],
            T.StructType.fromJson(json.loads(m["schema"])),
            m.get("delete_files", []),
            rel_from_marker=marker,
        )
        src_keys = source.select(*keys).distinct()
        touched_files = (
            cur.join(src_keys, keys, "left_semi").select("__rel").distinct()
        )
        touched_rel_set = {r["__rel"] for r in touched_files.collect()}
        untouched = [f for f in m["files"] if f not in touched_rel_set]

        data_cols = [c for c in cur.columns if c != "__rel"]
        if delete_col is not None:
            upserts = source.where(~F.col(delete_col)).select(*data_cols)
        else:
            upserts = source.select(*data_cols)
        touched_rows = cur.join(
            F.broadcast(touched_files), "__rel", "left_semi"
        ).drop("__rel")
        merged = touched_rows.join(source.select(*keys), keys, "left_anti").select(
            *data_cols
        ).unionByName(upserts)

        tag = f"merge{parent + 1}_{os.getpid()}"
        files = self._write_parts(merged, tag)
        # Equality deletes stay scoped to the files NOT rewritten (the
        # rewrite already applied them via read); entries whose scope
        # emptied drop out.
        kept_dvs = []
        untouched_set = set(untouched)
        for d in m.get("delete_files", []):
            scope = [f for f in d["applies_to"] if f in untouched_set]
            if scope:
                kept_dvs.append({**d, "applies_to": scope})
        return self._commit(
            untouched + files, m["schema"], parent,
            delete_files=kept_dvs or None,
        )

    def vacuum(self, keep_versions: int = 1) -> dict:
        """Retention: drop all but the newest ``keep_versions`` manifests
        ON THIS REF, then delete data files no surviving manifest
        references. This is the ONLY operation that destroys time
        travel — never automatic, and safe against readers of surviving
        versions because their manifests (and files) are untouched.

        Ref safety: data parts are SHARED across refs (branching copies
        a file list, not files), so the referenced set is computed over
        EVERY manifest of EVERY ref except the ones this vacuum drops —
        vacuuming main never deletes a fork point a branch still reads,
        and vacuuming a branch never deletes files main still lists.
        Tag-pinned versions on this ref are never dropped (tags are
        immutable audit pointers; delete the tag file first if you
        truly want its snapshot gone)."""
        if keep_versions < 1:
            raise ValueError("keep_versions must be >= 1")
        versions = self._versions()
        drop = versions[:-keep_versions]
        # tags pin versions immutably: never drop a tagged manifest
        tdir = os.path.join(self.path, "tags")
        pinned: set[int] = set()
        if os.path.isdir(tdir):
            for fn in os.listdir(tdir):
                if fn.endswith(".json"):
                    with open(os.path.join(tdir, fn)) as f:
                        tg = json.load(f)
                    if tg.get("ref", "main") == self.ref:
                        pinned.add(tg["version"])
        drop = [v for v in drop if v not in pinned]
        dropping = {(self.ref, v) for v in drop}
        # referenced = every file listed by ANY surviving manifest on ANY
        # ref — branches/tags share data parts, so survival is global
        referenced: set[str] = set()
        for ref in ["main", *self.branches()]:
            t = self if ref == self.ref else SnapshotTable(self.path, ref=ref)
            for v in t._versions():
                if (ref, v) in dropping:
                    continue
                mk = t._read_manifest(v)
                referenced.update(mk["files"])
                for d in mk.get("delete_files", []):
                    referenced.update(d.get("files", [d.get("file")]))
        removed_files = 0
        for v in drop:
            md = self._read_manifest(v)
            dvf = [
                f
                for d in md.get("delete_files", [])
                for f in d.get("files", [d.get("file")])
            ]
            for f in md["files"] + dvf:
                if f not in referenced:
                    full = os.path.join(self.path, f)
                    if os.path.exists(full):
                        os.remove(full)
                        removed_files += 1
            os.remove(self._manifest_path(v))
        # prune empty commit dirs left behind
        if os.path.isdir(self.data_dir):
            for d in os.listdir(self.data_dir):
                full = os.path.join(self.data_dir, d)
                if os.path.isdir(full) and not any(
                    f.endswith(".parquet") for f in os.listdir(full)
                ):
                    import shutil

                    shutil.rmtree(full)
        return {"dropped_versions": drop, "removed_files": removed_files}


def _read_files_with_dvs(
    spark: SparkSession,
    table_path: str,
    files: list[str],
    schema,
    dvs: list[dict],
    rel_from_marker: str | None = None,
) -> DataFrame:
    """Read a set of manifest-relative data files applying the equality-
    delete entries that cover them: files group by WHICH deletes apply
    (sequencing lives in each entry's ``applies_to``), each group
    anti-joins its (broadcast, tiny) delete-key tables once, groups
    union back.

    ``rel_from_marker``: when set, a ``__rel`` column (the manifest-
    relative file name) is attached DIRECTLY above each scan, before
    any delete anti-join — ``input_file_name()`` binds to exactly one
    source there, which Spark requires (``merge`` needs this)."""
    from pyspark.sql import functions as F

    def _scan(fl: list[str]) -> DataFrame:
        df = spark.read.schema(schema).parquet(
            *[os.path.join(table_path, f) for f in fl]
        )
        if rel_from_marker is not None:
            df = df.withColumn(
                "__rel",
                F.substring_index(F.input_file_name(), rel_from_marker, -1),
            )
        return df

    if not files:
        out = spark.createDataFrame([], schema)
        if rel_from_marker is not None:
            out = out.withColumn("__rel", F.lit(None).cast("string"))
        return out
    if not dvs:
        return _scan(files)
    applies = [set(d["applies_to"]) for d in dvs]
    groups: dict[tuple, list[str]] = {}
    for f in files:
        key = tuple(i for i, a in enumerate(applies) if f in a)
        groups.setdefault(key, []).append(f)
    parts = []
    for dkey, fl in groups.items():
        df = _scan(fl)
        for i in dkey:
            d = dvs[i]
            dfiles = d.get("files", [d["file"]] if "file" in d else [])
            delkeys = spark.read.parquet(
                *[os.path.join(table_path, f) for f in dfiles]
            )
            df = df.join(F.broadcast(delkeys), d["keys"], "left_anti")
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def snapshot_diff(
    table: SnapshotTable,
    spark: SparkSession,
    v_from: int,
    v_to: int,
    keys: list[str],
) -> DataFrame:
    """Change-data-capture between two committed versions: one row per
    changed key with ``change_op`` in (insert, update, delete), the key
    columns, and ``old_values`` / ``new_values`` structs of the non-key
    columns (NULL on the missing side of insert/delete).

    **Manifest-level file pruning is the scale story**: both manifests
    list their exact data files, and any file PRESENT IN BOTH versions
    holds identical rows by construction (data files are immutable), so
    the row diff scans only the symmetric difference of the two file
    lists. After a ``merge`` that rewrote 0.1% of a 100 TB table, the
    diff reads ~0.2% of it — the changed-file row sets — and never the
    shared bulk. Rows that merely MOVED files unchanged (compaction)
    survive the file prune but cancel in the value comparison
    (null-safe struct equality) and emit nothing.

    Contract: ``keys`` must be unique per version (the same precondition
    ``merge`` enforces); with duplicate keys the update pairing is
    ambiguous. Schema evolution is handled by projecting both sides
    through the *to*-version schema (added columns read as NULL on the
    old side, per the additive-evolution rule in ``append``).
    """
    from pyspark.sql import functions as F, types as T

    mf = table._read_manifest(v_from)
    mt = table._read_manifest(v_to)
    from_files, to_files = set(mf["files"]), set(mt["files"])
    dvs_f = mf.get("delete_files", [])
    dvs_t = mt.get("delete_files", [])

    # Merge-on-read awareness: a delete_where commit changes NO data
    # files, so the file prune alone would see nothing. A shared file
    # whose applicable equality-delete set differs between the versions
    # is logically changed — it joins the scan on both sides, each side
    # read through its OWN version's deletes.
    ap_f = [
        (tuple(d.get("files", [d.get("file")])), set(d["applies_to"]))
        for d in dvs_f
    ]
    ap_t = [
        (tuple(d.get("files", [d.get("file")])), set(d["applies_to"]))
        for d in dvs_t
    ]

    def _dv_key(ap: list, f: str) -> tuple:
        return tuple(sorted(name for name, a in ap if f in a))

    dv_changed = {
        f
        for f in from_files & to_files
        if _dv_key(ap_f, f) != _dv_key(ap_t, f)
    }
    only_f = sorted((from_files - to_files) | dv_changed)
    only_t = sorted((to_files - from_files) | dv_changed)

    schema_t = T.StructType.fromJson(json.loads(mt["schema"]))
    schema_f = T.StructType.fromJson(json.loads(mf["schema"]))

    old = _read_files_with_dvs(spark, table.path, only_f, schema_f, dvs_f)
    new = _read_files_with_dvs(spark, table.path, only_t, schema_t, dvs_t)
    val_cols = [f.name for f in schema_t.fields if f.name not in keys]
    for f in schema_t.fields:  # additive evolution: old side lacks new cols
        if f.name not in old.columns:
            old = old.withColumn(f.name, F.lit(None).cast(f.dataType))

    o = old.select(*keys, F.struct(*val_cols).alias("old_values"))
    n = new.select(*keys, F.struct(*val_cols).alias("new_values"))
    j = o.join(n, keys, "full_outer")
    op = (
        F.when(F.col("old_values").isNull(), F.lit("insert"))
        .when(F.col("new_values").isNull(), F.lit("delete"))
        .when(
            ~F.col("old_values").eqNullSafe(F.col("new_values")),
            F.lit("update"),
        )
        .otherwise(F.lit(None))  # moved file, identical row: not a change
    )
    return (
        j.withColumn("change_op", op)
        .where(F.col("change_op").isNotNull())
        .select("change_op", *keys, "old_values", "new_values")
    )


def diff_pruned_files(
    table: SnapshotTable, v_from: int, v_to: int
) -> tuple[list[str], list[str], list[str]]:
    """The file-prune decision ``snapshot_diff`` makes, surfaced for
    inspection/tests: (files only in v_from, files only in v_to, shared
    files skipped entirely)."""
    mf = table._read_manifest(v_from)["files"]
    mt = table._read_manifest(v_to)["files"]
    sf, st = set(mf), set(mt)
    return sorted(sf - st), sorted(st - sf), sorted(sf & st)
