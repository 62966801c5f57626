"""HTTP serving front-end: request scheduling, same-video micro-batching,
resident chat sessions with disk spill, OpenAI-compatible adapter."""

from quickvideo_tpu.serving.server import (
    LVUServer,
    RequestError,
    ServerConfig,
    main,
    make_http_server,
    openai_to_reference_messages,
)

__all__ = [
    "LVUServer",
    "RequestError",
    "ServerConfig",
    "main",
    "make_http_server",
    "openai_to_reference_messages",
]
