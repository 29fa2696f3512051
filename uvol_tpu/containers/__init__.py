from uvol_tpu.containers.drcs import DrcsReader, DrcsWriter  # noqa: F401
from uvol_tpu.containers.ktx2 import (  # noqa: F401
    BasisLZGlobalData,
    KTX2File,
    KTX2Level,
    read_ktx2,
    write_ktx2,
)
from uvol_tpu.containers.manifest import (  # noqa: F401
    load_manifest,
    save_manifest,
    validate_v2_manifest,
)
