from .session import StreamSession, chunk_step  # noqa: F401
