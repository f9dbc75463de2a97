"""RBAC surface + enforcement (test_milvus_client_rbac.py cases;
privilege catalog constant.go:80-210)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from milvus_spark.client import MilvusSparkClient
from milvus_spark.rbac import RbacError


@pytest.fixture()
def client(spark, tmp_path):
    return MilvusSparkClient(spark, root=str(tmp_path / "rbac_root"))


def test_user_lifecycle_and_validation(client):
    client.create_user("alice", "p@ssw0rd")
    assert "alice" in client.list_users() and "root" in client.list_users()
    assert client.describe_user("alice") == {"user_name": "alice", "roles": ()}
    with pytest.raises(ValueError, match="exists"):
        client.create_user("alice", "p@ssw0rd")
    # invalid names (reference invalid-name matrix) and passwords
    for bad in ["1user", "user-name", "a" * 33, ""]:
        with pytest.raises(ValueError):
            client.create_user(bad, "p@ssw0rd")
    with pytest.raises(ValueError, match="6-256"):
        client.create_user("bob", "short")
    client.drop_user("alice")
    assert "alice" not in client.list_users()
    with pytest.raises(ValueError, match="root"):
        client.drop_user("root")


def test_password_and_login(client):
    client.create_user("carol", "secret123")
    client.login("carol", "secret123")
    assert client._current_user == "carol"
    client.logout()
    with pytest.raises(RbacError, match="auth check failure"):
        client.login("carol", "wrongpass")
    client.update_password("carol", "secret123", "newsecret1")
    with pytest.raises(ValueError, match="mismatch"):
        client.update_password("carol", "secret123", "another123")
    client.login("carol", "newsecret1")
    client.logout()


def test_role_lifecycle_and_grants(client):
    client.create_role("reader")
    assert set(client.list_roles()) >= {"admin", "public", "reader"}
    client.create_user("dave", "davepass1")
    client.grant_role("dave", "reader")
    assert client.describe_user("dave")["roles"] == ("reader",)
    # a role granted to users refuses to drop (reference semantics)
    with pytest.raises(ValueError, match="granted to users"):
        client.drop_role("reader")
    client.revoke_role("dave", "reader")
    client.drop_role("reader")
    assert "reader" not in client.list_roles()
    for builtin in ("admin", "public"):
        with pytest.raises(ValueError, match="built-in"):
            client.drop_role(builtin)
    with pytest.raises(ValueError, match="not found"):
        client.grant_role("dave", "ghost")


def test_privilege_enforcement(client, spark, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    client.create_collection("nat", pk_field="n_nationkey")
    client.insert("nat", nation)

    client.create_user("eve", "evepass12")
    client.create_role("nat_reader")
    client.grant_privilege("nat_reader", "CollectionReadOnly", "nat")
    client.grant_role("eve", "nat_reader")
    client.login("eve", "evepass12")
    try:
        # group-expanded read privileges pass
        assert client.query("nat", filter="n_regionkey == 1").count() > 0
        # writes and DDL denied
        with pytest.raises(RbacError, match="Insert"):
            client.insert("nat", nation.limit(1))
        with pytest.raises(RbacError, match="Delete"):
            client.delete("nat", ids=[0])
        with pytest.raises(RbacError, match="DropCollection"):
            client.drop_collection("nat")
        with pytest.raises(RbacError, match="CreateCollection"):
            client.create_collection("other", pk_field="x")
        # object scoping: the grant names 'nat' only
        client.logout()
        client.create_collection("nat2", pk_field="n_nationkey")
        client.insert("nat2", nation)
        client.login("eve", "evepass12")
        with pytest.raises(RbacError, match="Query"):
            client.query("nat2", filter="n_regionkey == 1")
    finally:
        client.logout()

    # ReadWrite group unlocks DML; explicit revoke re-locks
    client.grant_privilege("nat_reader", "CollectionReadWrite", "nat")
    client.login("eve", "evepass12")
    n0 = client.query("nat", output_fields=["n_nationkey"]).count()
    client.delete("nat", ids=[0])
    assert client.query("nat", output_fields=["n_nationkey"]).count() == n0 - 1
    client.logout()
    client.revoke_privilege("nat_reader", "CollectionReadWrite", "nat")
    client.login("eve", "evepass12")
    with pytest.raises(RbacError, match="Delete"):
        client.delete("nat", ids=[1])
    client.logout()

    # admin role bypasses everything; RBAC APIs themselves are privileged
    client.grant_role("eve", "admin")
    client.login("eve", "evepass12")
    client.create_collection("adm", pk_field="k")
    client.create_user("frank", "frankpass")
    client.logout()
    with pytest.raises(ValueError, match="unknown privilege"):
        client.grant_privilege("nat_reader", "Fly", "nat")


def test_rbac_persists_across_clients(client, spark):
    client.create_user("gina", "ginapass1")
    client.create_role("r1")
    client.grant_role("gina", "r1")
    reopened = MilvusSparkClient(spark, root=client._base_root)
    assert "gina" in reopened.list_users()
    assert reopened.describe_user("gina")["roles"] == ("r1",)


def test_rbac_api_requires_privilege(client):
    client.create_user("henry", "henrypass")
    client.login("henry", "henrypass")
    try:
        with pytest.raises(RbacError, match="UpdateUser"):
            client.create_user("x1", "password1")
        with pytest.raises(RbacError, match="SelectUser"):
            client.list_users()
    finally:
        client.logout()


def test_logout_is_not_an_escalation(spark, tmp_path):
    """A client constructed with restricted credentials can never regain
    root without credentials (r4 advice: logout() used to reset to root)."""
    root_dir = str(tmp_path / "esc_root")
    admin = MilvusSparkClient(spark, root=root_dir)
    admin.create_user("mallory", "mallorypw")

    restricted = MilvusSparkClient(spark, root=root_dir, user="mallory", password="mallorypw")
    assert restricted._current_user == "mallory"
    restricted.logout()
    assert restricted._current_user == "mallory"  # NOT root
    with pytest.raises(RbacError):
        restricted.create_user("evil", "evilpass1")
    # regaining root requires actual root credentials
    with pytest.raises(RbacError, match="auth check failure"):
        restricted.login("root", "wrong")
    restricted.login("root", "Milvus")
    assert restricted._current_user == "root"
    # logout drops back to the constructed identity, not root
    restricted.logout()
    assert restricted._current_user == "mallory"
    # constructing with a non-root identity REQUIRES a password
    with pytest.raises(ValueError, match="password required"):
        MilvusSparkClient(spark, root=root_dir, user="mallory")
    with pytest.raises(RbacError, match="auth check failure"):
        MilvusSparkClient(spark, root=root_dir, user="mallory", password="nope12")


def test_grant_privilege_v2_database_scope(spark, tmp_path, sf_dir):
    """Database-scoped grants (grant_privilege_v2 db_name): a privilege
    granted in one database does not apply in another; db_name='*' applies
    everywhere (test_milvus_client_rbac.py:415)."""
    client = MilvusSparkClient(spark, root=str(tmp_path / "v2_root"))
    nation = client.spark.read.parquet(f"{sf_dir}/nation.parquet")
    client.create_database("db2")
    client.create_collection("nat", pk_field="n_nationkey")
    client.insert("nat", nation)
    client.use_database("db2")
    client.create_collection("nat", pk_field="n_nationkey")
    client.insert("nat", nation)
    client.use_database("default")

    client.create_user("zoe", "zoepass12")
    client.create_role("db2_reader")
    client.grant_privilege_v2("db2_reader", "CollectionReadOnly", "nat", db_name="db2")
    client.grant_role("zoe", "db2_reader")
    client.login("zoe", "zoepass12")
    try:
        with pytest.raises(RbacError, match="Query"):
            client.query("nat", filter="n_regionkey == 1")  # default db: denied
        client.use_database("db2")
        assert client.query("nat", filter="n_regionkey == 1").count() > 0
        client.use_database("default")
    finally:
        client.logout()
    # revoke requires the same (collection, db) scope
    client.revoke_privilege_v2("db2_reader", "CollectionReadOnly", "nat", db_name="db2")
    client.login("zoe", "zoepass12")
    client.use_database("db2")
    with pytest.raises(RbacError, match="Query"):
        client.query("nat", filter="n_regionkey == 1")
    client.logout()
    client.use_database("default")
    # wildcard db grant applies in every database
    client.grant_privilege_v2("db2_reader", "CollectionReadOnly", "nat", db_name="*")
    client.login("zoe", "zoepass12")
    assert client.query("nat", filter="n_regionkey == 1").count() > 0
    client.use_database("db2")
    assert client.query("nat", filter="n_regionkey == 1").count() > 0


def test_custom_privilege_groups(spark, tmp_path, sf_dir):
    """create_privilege_group / add_privileges_to_group / grant of a custom
    group name (test_milvus_client_rbac.py:752-900)."""
    client = MilvusSparkClient(spark, root=str(tmp_path / "pg_root"))
    client.create_privilege_group("query_only")
    assert "query_only" in client.list_privilege_groups()
    assert "CollectionReadOnly" in client.list_privilege_groups()  # built-ins listed
    with pytest.raises(ValueError, match="conflicts"):
        client.create_privilege_group("CollectionReadOnly")
    with pytest.raises(ValueError, match="invalid"):
        client.create_privilege_group("bad-name!")
    with pytest.raises(ValueError, match="unknown privilege"):
        client.add_privileges_to_group("query_only", ["Fly"])
    client.add_privileges_to_group("query_only", ["Query", "GetStatistics"])
    assert client.list_privilege_groups()["query_only"] == ("GetStatistics", "Query")

    nation = client.spark.read.parquet(f"{sf_dir}/nation.parquet")
    client.create_collection("nat", pk_field="n_nationkey")
    client.insert("nat", nation)
    client.create_user("pat", "patpass12")
    client.create_role("qr")
    client.grant_privilege("qr", "query_only", "nat")
    client.grant_role("pat", "qr")
    client.login("pat", "patpass12")
    try:
        assert client.query("nat", filter="n_regionkey == 1").count() > 0
        with pytest.raises(RbacError, match="Insert"):
            client.insert("nat", nation.limit(1))
    finally:
        client.logout()
    # group membership is live: removing a privilege re-locks the grantees
    client.remove_privileges_from_group("query_only", ["Query"])
    client.login("pat", "patpass12")
    with pytest.raises(RbacError, match="Query"):
        client.query("nat", filter="n_regionkey == 1")
    client.logout()
    # a group referenced by a grant refuses to drop; built-ins always refuse
    with pytest.raises(RbacError, match="granted to roles"):
        client.drop_privilege_group("query_only")
    client.revoke_privilege("qr", "query_only", "nat")
    client.drop_privilege_group("query_only")
    assert "query_only" not in client.list_privilege_groups()
    with pytest.raises(ValueError, match="built-in"):
        client.drop_privilege_group("DatabaseAdmin")


def test_rbac_backup_restore(spark, tmp_path):
    """BackupRBAC/RestoreRBAC round-trip across stores."""
    a = MilvusSparkClient(spark, root=str(tmp_path / "bk_a"))
    a.create_user("uma", "umapass12")
    a.create_role("ops")
    a.grant_role("uma", "ops")
    a.grant_privilege_v2("ops", "DatabaseReadOnly", "*", db_name="prod")
    a.create_privilege_group("gg")
    a.add_privileges_to_group("gg", ["Flush"])
    dump = a.backup_rbac()

    b = MilvusSparkClient(spark, root=str(tmp_path / "bk_b"))
    b.restore_rbac(dump)
    assert "uma" in b.list_users()
    assert b.describe_user("uma")["roles"] == ("ops",)
    assert b.list_privilege_groups()["gg"] == ("Flush",)
    b.login("uma", "umapass12")  # passwords survive the round-trip
    with pytest.raises(RbacError, match="RestoreRBAC"):
        b.restore_rbac(dump)  # restore itself is a privileged operation
    b.logout()
    with pytest.raises(ValueError, match="invalid RBAC backup"):
        b.restore_rbac({"nope": 1})


def test_database_apis_are_privileged(spark, tmp_path, sf_dir):
    """Database property APIs enforce AlterDatabase/DescribeDatabase etc.
    (code-review fix): a restricted user can neither read nor flip the
    force-deny switches, and read entry points beyond query/search also
    honor both RBAC and deny-reading."""
    root_dir = str(tmp_path / "dbpriv")
    c = MilvusSparkClient(spark, root=root_dir)
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    c.create_collection("nat", pk_field="n_nationkey")
    c.insert("nat", nation)
    c.create_user("bob", "bobpass12")
    c.create_role("r_read")
    c.grant_privilege("r_read", "CollectionReadOnly", "nat")
    c.grant_role("bob", "r_read")
    c.login("bob", "bobpass12")
    try:
        for call in (
            lambda: c.alter_database_properties("default", {"database.force.deny.writing": "false"}),
            lambda: c.drop_database_properties("default", ["database.force.deny.reading"]),
            lambda: c.describe_database("default"),
            lambda: c.create_database("bobdb"),
            lambda: c.drop_database("ghost"),
            lambda: c.list_databases(),
        ):
            with pytest.raises(RbacError):
                call()
        # Query-privileged read entry points still work for bob on nat...
        assert c.count("nat") > 0
        assert c.get("nat", ids=[1]).count() == 1
        assert len(c.text_search("nat", "n_name", "canada").columns) == 3
    finally:
        c.logout()
    # ...and deny-reading now covers get/count/iterator/text_search too
    c.alter_database_properties("default", {"database.force.deny.reading": "true"})
    for call in (
        lambda: c.count("nat"),
        lambda: c.get("nat", ids=[1]),
        lambda: next(c.query_iterator("nat")),
        lambda: c.text_search("nat", "n_name", "canada"),
    ):
        with pytest.raises(PermissionError, match="deny.reading"):
            call()
    c.drop_database_properties("default", ["database.force.deny.reading"])


def test_drop_unknown_privilege_group_raises(spark, tmp_path):
    c = MilvusSparkClient(spark, root=str(tmp_path / "pg2"))
    with pytest.raises(ValueError, match="not found"):
        c.drop_privilege_group("typo_name")


def test_failed_create_leaves_no_phantom_collection(spark, tmp_path):
    """create_collection validation failures must not leave a catalog
    entry behind (code-review fix): a retry with fixed params succeeds."""
    c = MilvusSparkClient(spark, root=str(tmp_path / "ph"))
    with pytest.raises(ValueError, match="invalid warmup"):
        c.create_collection("w", "pk", field_warmup={"x": "bogus"})
    assert not c.has_collection("w")
    c.create_collection("w", "pk", field_warmup={"x": "sync"})  # retry works
    with pytest.raises(ValueError, match="invalid warmup"):
        c.alter_collection_properties("w", {"warmup": "bogus"})


def test_alter_role_properties(client):
    client.create_role("ops_team")
    client.alter_role("ops_team", {"comment": "on-call operators"})
    assert client.describe_role("ops_team")["properties"] == {
        "comment": "on-call operators"
    }
    with pytest.raises(ValueError, match="not found"):
        client.alter_role("ghost", {"x": "y"})
