"""K5 — Girder-shaped REST upload sink.

Re-expresses the reference's GirderUploadStreamProcessor (reference:
girder/girder_upload_stream_processor.py:1-552) as a ``foreachBatch``
sink over completed-file rows:

  - mirrors the producer-side subdirectory structure as a Folder
    hierarchy under a root Folder (``__process_downloaded_data_file``,
    ref :264-290);
  - finds-or-creates the Collection and root Folder chain on setup
    (``__init_collection``/``__init_root_folder``, ref :379-445);
  - attaches base metadata (engine version, topic) to every Folder and
    a ``checksum.sha256`` to every uploaded Item (ref :347-351);
  - skip-if-same-checksum / replace-or-warn semantics for existing
    Items (ref :296-333), which also makes micro-batch replays
    idempotent — the Spark analogue of the reference's
    skip-existing check.

The REST client is pluggable: executors build their own client from a
picklable ``client_factory`` (the reference likewise builds one
girder_client per thread, ref :207-223). ``girder_client_factory`` wires
the real girder-client library when it is installed; tests inject an
in-memory fake with the same surface.
"""

from __future__ import annotations

import hashlib
import mimetypes
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import CODE_SUCCESSFULLY_RECONSTRUCTED

BASE_METADATA_VERSION_KEY = "OpenMSIStreamSparkVersion"


class GirderLikeClient:
    """The minimal client surface the sink drives. Mirrors the
    girder_client calls the reference makes; any REST backend with
    folders/items/files + metadata can implement it."""

    def list_collection(self, name: str):  # -> collection dict | None
        raise NotImplementedError

    def create_collection(self, name: str, public: bool = True):  # -> dict
        raise NotImplementedError

    def ensure_folder(self, parent_id: str, name: str, parent_type: str) -> str:
        """Find-or-create a folder, returning its id (reuseExisting)."""
        raise NotImplementedError

    def add_folder_metadata(self, folder_id: str, metadata: dict) -> None:
        raise NotImplementedError

    def find_item(self, folder_id: str, name: str):
        """-> (file dict | None, item dict | None) for an existing item
        of this name (reference existing_resource, ref :61-64)."""
        raise NotImplementedError

    def upload_new_file(
        self, folder_id: str, filename: str, data: bytes, mimetype: str
    ) -> str:
        """Upload as a new item; returns the item id."""
        raise NotImplementedError

    def replace_existing_file(self, file_obj: dict, data: bytes) -> str:
        """Replace an existing file's contents; returns the item id."""
        raise NotImplementedError

    def add_item_metadata(self, item_id: str, metadata: dict) -> None:
        raise NotImplementedError


class FilesystemGirderClient(GirderLikeClient):
    """A filesystem-backed implementation of the client surface for
    development and tests (the reference tests its Girder sink against a
    local docker Girder, test/local-girder-docker-compose.yml — this is
    the in-container analogue). Folders are directories; an item is
    '<name>.item.json' plus '<name>.bin' alongside it; ids are absolute
    paths, so state written on executors is visible to the driver."""

    def __init__(self, root: str):
        import os

        self.root = root
        os.makedirs(root, exist_ok=True)

    def list_collection(self, name):
        import os

        p = os.path.join(self.root, "collections", name)
        return {"_id": p, "name": name} if os.path.isdir(p) else None

    def create_collection(self, name, public=True):
        import os

        p = os.path.join(self.root, "collections", name)
        os.makedirs(p, exist_ok=True)
        return {"_id": p, "name": name}

    def ensure_folder(self, parent_id, name, parent_type):
        import os

        p = os.path.join(parent_id, name)
        os.makedirs(p, exist_ok=True)
        return p

    def add_folder_metadata(self, folder_id, metadata):
        import json
        import os

        with open(os.path.join(folder_id, "_folder_meta.json"), "w") as fh:
            json.dump(metadata, fh)

    def _item_path(self, folder_id, name):
        import os

        return os.path.join(folder_id, f"{name}.item.json")

    def find_item(self, folder_id, name):
        import json
        import os

        ip = self._item_path(folder_id, name)
        if not os.path.exists(ip):
            return None, None
        with open(ip) as fh:
            item = json.load(fh)
        return item.get("file"), item

    def upload_new_file(self, folder_id, filename, data, mimetype):
        import json
        import os

        bin_path = os.path.join(folder_id, f"{filename}.bin")
        with open(bin_path, "wb") as fh:
            fh.write(data)
        item = {
            "_id": self._item_path(folder_id, filename),
            "name": filename,
            "mimetype": mimetype,
            "meta": {},
            "file": {
                "_id": bin_path,
                "itemId": self._item_path(folder_id, filename),
                "sha512": hashlib.sha512(data).hexdigest(),
            },
            "n_uploads": 1,
        }
        with open(item["_id"], "w") as fh:
            json.dump(item, fh)
        return item["_id"]

    def replace_existing_file(self, file_obj, data):
        import json

        with open(file_obj["_id"], "wb") as fh:
            fh.write(data)
        item_id = file_obj["itemId"]
        with open(item_id) as fh:
            item = json.load(fh)
        item["file"]["sha512"] = hashlib.sha512(data).hexdigest()
        item["n_uploads"] = item.get("n_uploads", 1) + 1
        with open(item_id, "w") as fh:
            json.dump(item, fh)
        return item_id

    def add_item_metadata(self, item_id, metadata):
        import json

        with open(item_id) as fh:
            item = json.load(fh)
        item["meta"].update(metadata)
        with open(item_id, "w") as fh:
            json.dump(item, fh)


def girder_client_factory(api_url: str, api_key: str) -> Callable[[], GirderLikeClient]:
    """Factory for a real girder-client-backed adapter. Import-gated:
    the library isn't shipped in this container; raises cleanly."""

    def build() -> GirderLikeClient:
        try:
            import girder_client  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise RuntimeError(
                "girder_client_factory requires the girder-client package"
            ) from exc

        gc = girder_client.GirderClient(apiUrl=api_url)
        gc.authenticate(apiKey=api_key)

        class _Adapter(GirderLikeClient):  # pragma: no cover - needs live server
            def list_collection(self, name):
                for resp in gc.listCollection():
                    if resp.get("_modelType") == "collection" and resp["name"] == name:
                        return resp
                return None

            def create_collection(self, name, public=True):
                return gc.createCollection(name, public=public)

            def ensure_folder(self, parent_id, name, parent_type):
                folder = gc.createFolder(
                    parent_id, name, parentType=parent_type, reuseExisting=True
                )
                return folder["_id"]

            def add_folder_metadata(self, folder_id, metadata):
                gc.addMetadataToFolder(folder_id, metadata)

            def find_item(self, folder_id, name):
                for item in gc.listItem(folder_id, name=name):
                    return next(gc.listFile(item["_id"]), None), item
                return None, None

            def upload_new_file(self, folder_id, filename, data, mimetype):
                from io import BytesIO

                up = gc.uploadStreamToFolder(
                    folder_id, BytesIO(data), filename, len(data), mimeType=mimetype
                )
                return up["itemId"]

            def replace_existing_file(self, file_obj, data):
                from io import BytesIO

                gc.uploadFileContents(file_obj["_id"], BytesIO(data), len(data))
                return file_obj["itemId"]

            def add_item_metadata(self, item_id, metadata):
                gc.addMetadataToItem(item_id, metadata)

        return _Adapter()

    return build


def ensure_root_folder(
    client: GirderLikeClient,
    collection_name: str,
    root_folder_path: str | None = None,
    topic_name: str = "",
    base_metadata: dict | None = None,
) -> str:
    """Find-or-create the Collection and the root Folder chain under it,
    returning the root folder id (reference __init_collection /
    __init_root_folder, girder_upload_stream_processor.py:379-445). When
    no path is given a Folder named after the topic is created."""
    coll = client.list_collection(collection_name)
    if coll is None:
        coll = client.create_collection(collection_name, public=True)
    path = root_folder_path or f"{collection_name}/{topic_name}"
    parts = path.strip("/").split("/")
    if parts and parts[0] == collection_name:
        parts = parts[1:]
    parent_id, parent_type = coll["_id"], "collection"
    for name in parts:
        parent_id = client.ensure_folder(parent_id, name, parent_type)
        if base_metadata:
            client.add_folder_metadata(parent_id, dict(base_metadata))
        parent_type = "folder"
    return parent_id


def upload_batch_to_girder(
    batch_df: DataFrame,
    client_factory: Callable[[], GirderLikeClient],
    root_folder_id: str,
    base_metadata: dict | None = None,
    replace_existing: bool = False,
) -> None:
    """Upload one micro-batch of completed files (rel_path, file_bytes,
    file_hash) into the folder hierarchy under ``root_folder_id``.

    Runs on executors via foreachPartition — the driver never holds file
    bytes; each partition builds its own client (the reference builds one
    per consumer thread). Existing items with a matching sha512/sha256
    are skipped (idempotent replay); mismatching ones are replaced only
    when ``replace_existing`` (ref :296-333).

    Only successfully-reconstructed files are uploaded: streaming
    assembly also emits IN_PROGRESS snapshots, CORRUPTION,
    HASH_MISMATCH, and COMPLETE_OFFSETS_ONLY rows (null or corrupt
    ``file_bytes``) — the reference only hands hash-verified completed
    files to the Girder path (girder_upload_stream_processor.py).
    """
    meta = dict(base_metadata or {})
    if "status" in batch_df.columns:
        batch_df = batch_df.filter(
            F.col("status") == CODE_SUCCESSFULLY_RECONSTRUCTED
        )
    rows = batch_df.select("rel_path", "file_bytes", "file_hash").filter(
        F.col("file_bytes").isNotNull()
    )

    def _part(it):
        client = client_factory()
        folder_cache: dict[tuple[str, str], str] = {}
        for row in it:
            payload = bytes(row.file_bytes)
            # rel_path comes off the wire: benign ''/'.' segments (double
            # slashes, trailing '/') normalize away — same tolerance as
            # the disk sink's os.path normalization — but '..' must never
            # climb the folder hierarchy
            parts = [
                p for p in row.rel_path.strip("/").split("/") if p not in ("", ".")
            ]
            if not parts or any(p == ".." for p in parts):
                raise ValueError(
                    f"unsafe rel_path escapes folder hierarchy: {row.rel_path!r}"
                )
            filename, subdirs = parts[-1], parts[:-1]
            parent_id = root_folder_id
            for name in subdirs:
                cache_key = (parent_id, name)
                if cache_key not in folder_cache:
                    fid = client.ensure_folder(parent_id, name, "folder")
                    client.add_folder_metadata(fid, dict(meta))
                    folder_cache[cache_key] = fid
                parent_id = folder_cache[cache_key]

            sha256_hex = hashlib.sha256(payload).hexdigest()
            sha512_hex = bytes(row.file_hash).hex()
            mimetype = mimetypes.guess_type(filename)[0] or "application/octet-stream"

            existing_file, existing_item = client.find_item(parent_id, filename)
            if existing_item is not None and existing_file is not None:
                same = (existing_file.get("sha512") == sha512_hex) or (
                    existing_item.get("meta", {}).get("checksum", {}).get("sha256")
                    == sha256_hex
                )
                if same:
                    continue  # already uploaded — idempotent skip
                if not replace_existing:
                    continue  # differing content; caller opted out of replace
                item_id = client.replace_existing_file(existing_file, payload)
            else:
                item_id = client.upload_new_file(
                    parent_id, filename, payload, mimetype
                )

            item_meta = dict(meta)
            item_meta["checksum"] = {"sha256": sha256_hex}
            client.add_item_metadata(item_id, item_meta)

    rows.rdd.foreachPartition(_part)


def girder_sink(
    completed: DataFrame,
    client_factory: Callable[[], GirderLikeClient],
    root_folder_id: str,
    checkpoint_dir: str,
    base_metadata: dict | None = None,
    replace_existing: bool = False,
):
    """K5 — attach the Girder-shaped upload as a foreachBatch sink on a
    streaming DataFrame of completed files."""
    return (
        completed.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            lambda df, _epoch: upload_batch_to_girder(
                df, client_factory, root_folder_id, base_metadata, replace_existing
            )
        )
    )
