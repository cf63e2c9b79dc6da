"""CLI: run the HTTP API server."""
from ..server.app import start_server

if __name__ == "__main__":
    start_server()
