from uvol_tpu.codecs.corto.decoder import CortoMesh, decode_crt  # noqa: F401
from uvol_tpu.codecs.corto.encoder import encode_crt  # noqa: F401
