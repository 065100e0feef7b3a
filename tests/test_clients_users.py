"""Client registry, users/auth, sessions, storage, admin CLI tests."""

import time

import pytest

from openwebrx_tpu.core.clients import (
    ClientRegistry, RobotScore, TooManyClientsError, BannedClientError,
)
from openwebrx_tpu.core.config import Config
from openwebrx_tpu.core.storage import Storage
from openwebrx_tpu.core.users import Password, SessionStorage, UserList


class FakeClient:
    def __init__(self):
        self.messages = []
        self.banned = False

    def write_clients(self, count):
        self.messages.append(("clients", count))

    def write_chat_message(self, name, text, color):
        self.messages.append(("chat", name, text, color))

    def write_log_message(self, msg):
        self.messages.append(("log", msg))

    def close_banned(self):
        self.banned = True


@pytest.fixture(autouse=True)
def fresh():
    Config.reset()
    ClientRegistry.reset()
    yield
    ClientRegistry.reset()
    Config.reset()


class TestClientRegistry:
    def test_limits(self):
        Config.get()["max_clients"] = 2
        reg = ClientRegistry.shared()
        reg.add_client(FakeClient(), "1.1.1.1")
        reg.add_client(FakeClient(), "1.1.1.2")
        with pytest.raises(TooManyClientsError):
            reg.add_client(FakeClient(), "1.1.1.3")

    def test_per_ip_limit(self):
        Config.get()["max_clients_per_ip"] = 1
        reg = ClientRegistry.shared()
        reg.add_client(FakeClient(), "9.9.9.9")
        with pytest.raises(TooManyClientsError):
            reg.add_client(FakeClient(), "9.9.9.9")

    def test_ban_drops_and_blocks(self):
        reg = ClientRegistry.shared()
        c = FakeClient()
        reg.add_client(c, "6.6.6.6")
        reg.ban("6.6.6.6", 1)
        assert c.banned
        with pytest.raises(BannedClientError):
            reg.add_client(FakeClient(), "6.6.6.6")
        # expiry
        reg.bans["6.6.6.6"] = time.time() - 1
        assert not reg.is_banned("6.6.6.6")

    def test_chat_broadcast(self):
        reg = ClientRegistry.shared()
        a, b = FakeClient(), FakeClient()
        reg.add_client(a, "1.1.1.1")
        reg.add_client(b, "1.1.1.2")
        reg.broadcast_chat_message(a, "hello", "op")
        assert ("chat", "op", "hello", b.messages[-1][3]) == b.messages[-1]

    def test_robot_score(self):
        score = RobotScore()
        flagged = False
        for _ in range(6):
            flagged = score.record_change()
        assert flagged
        slow = RobotScore()
        slow.last_change = time.time() - 100
        assert not slow.record_change()


class TestUsers:
    def test_password_hash_roundtrip(self):
        p = Password.create("hunter2")
        assert p.is_valid("hunter2")
        assert not p.is_valid("hunter3")
        restored = Password.from_dict(p.to_json())
        assert restored.is_valid("hunter2")

    def test_userlist_store(self, tmp_path):
        path = str(tmp_path / "users.json")
        ul = UserList(path)
        ul.add_user("admin", "secret")
        assert "admin" in ul
        assert ul.authenticate("admin", "secret") is not None
        assert ul.authenticate("admin", "wrong") is None
        ul.set_enabled("admin", False)
        assert ul.authenticate("admin", "secret") is None
        reloaded = UserList(path)
        assert "admin" in reloaded

    def test_sessions(self):
        s = SessionStorage()
        key = s.create({"user": "admin"})
        assert s.get(key) == {"user": "admin"}
        s.sessions[key]["expires"] = 0
        assert s.get(key) is None

    def test_admin_cli(self, tmp_path, monkeypatch, capsys):
        from openwebrx_tpu.core import users as users_mod
        ul = UserList(str(tmp_path / "users.json"))
        monkeypatch.setattr(users_mod.UserList, "shared", staticmethod(lambda: ul))
        from openwebrx_tpu.__main__ import main
        assert main(["admin", "adduser", "op", "--password", "pw"]) == 0
        assert main(["admin", "hasuser", "op"]) == 0
        assert main(["admin", "listusers"]) == 0
        assert "op" in capsys.readouterr().out
        assert main(["admin", "removeuser", "op"]) == 0
        assert main(["admin", "hasuser", "op"]) == 1


class TestStorage:
    def test_whitelist_and_collisions(self, tmp_path):
        st = Storage(str(tmp_path))
        assert st.valid_name("SSTV-image.png")
        assert not st.valid_name("../etc/passwd")
        assert not st.valid_name(".hidden")
        p1 = st.new_file("img.png")
        open(p1, "w").write("x")
        p2 = st.new_file("img.png")
        assert p2.endswith("img-2.png")

    def test_retention(self, tmp_path):
        st = Storage(str(tmp_path))
        for i in range(5):
            open(st.path_for(f"f{i}.txt"), "w").write("x")
            time.sleep(0.01)
        st.cleanup(keep=2)
        assert len(st.list_files()) == 2
