from bigsi_tpu.storage.kv import TypedKV
from bigsi_tpu.storage.index_store import IndexStore, MemoryStore, get_storage

__all__ = ["TypedKV", "IndexStore", "MemoryStore", "get_storage"]
