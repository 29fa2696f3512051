from uvol_tpu.player.clock import PlaybackClock, VirtualClock  # noqa: F401
from uvol_tpu.player.facade import Player  # noqa: F401
from uvol_tpu.player.scheduler import (  # noqa: F401
    PrefetchState,
    V1RequestPacer,
    eviction_thresholds,
    get_current_frame,
    plan_prefetch,
)
from uvol_tpu.player.v1 import V1FrameResult, V1Player  # noqa: F401
from uvol_tpu.player.v2 import FrameResult, V2Player  # noqa: F401
