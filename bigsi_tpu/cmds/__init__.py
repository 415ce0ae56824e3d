from bigsi_tpu.cmds.bloom import bloom
from bigsi_tpu.cmds.build import build, load_bloomfilter
from bigsi_tpu.cmds.insert import insert
from bigsi_tpu.cmds.merge import merge
from bigsi_tpu.cmds.delete import delete
from bigsi_tpu.cmds.variant_search import (
    BIGSIVariantSearch,
    BIGSIAminoAcidMutationSearch,
)

__all__ = [
    "bloom",
    "build",
    "load_bloomfilter",
    "insert",
    "merge",
    "delete",
    "BIGSIVariantSearch",
    "BIGSIAminoAcidMutationSearch",
]
