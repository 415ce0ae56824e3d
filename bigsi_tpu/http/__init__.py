from bigsi_tpu.http.server import serve, make_server

__all__ = ["serve", "make_server"]
