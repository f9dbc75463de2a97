"""RBAC: users / roles / privileges with enforcement hooks.

Reference parity (file:line into /root/reference):
  - API surface + validation: tests/python_client/milvus_client/
    test_milvus_client_rbac.py (create/drop/describe/list users & roles,
    grant/revoke role & privilege, password update, invalid-name matrix).
  - Privilege catalog & groups: pkg/util/constant.go:80-210
    (ObjectPrivileges per object type, ReadOnly/ReadWrite privilege
    groups, DefaultRoles admin/public).
  - Enforcement point: the proxy interceptor checks (user, object,
    privilege) before each RPC — here ``check`` runs at the top of the
    client methods, same contract.

State is a JSON document beside the collection catalog — RBAC metadata is
tiny and control-plane-only; nothing here touches the data path.
"""

from __future__ import annotations

import hashlib
import json
import os
import re

ROOT_USER = "root"
ROLE_ADMIN = "admin"
ROLE_PUBLIC = "public"

# collection-scope privileges (constant.go ObjectPrivileges["Collection"])
COLLECTION_PRIVS = {
    "Load", "Release", "Compaction", "Insert", "Delete", "Upsert",
    "GetStatistics", "CreateIndex", "IndexDetail", "DropIndex", "Search",
    "Flush", "Query", "Import", "GetLoadState", "CreatePartition",
    "DropPartition", "ShowPartitions", "HasPartition",
}
GLOBAL_PRIVS = {
    "All", "CreateCollection", "DropCollection", "DescribeCollection",
    "ShowCollections", "RenameCollection", "CreateDatabase", "DropDatabase",
    "ListDatabases", "CreateAlias", "DropAlias", "ListAliases",
    "SelectUser", "UpdateUser",
    # v2 additions (constant.go:374-445): database/cluster scoped verbs +
    # privilege-group administration + RBAC backup/restore
    "DescribeDatabase", "AlterDatabase", "FlushAll", "ListPrivilegeGroups",
    "CreatePrivilegeGroup", "DropPrivilegeGroup", "OperatePrivilegeGroup",
    "BackupRBAC", "RestoreRBAC",
    # resource-group administration (constant.go:143-149,297-303)
    "CreateResourceGroup", "UpdateResourceGroups", "DropResourceGroup",
    "DescribeResourceGroup", "ListResourceGroups", "TransferReplica",
    "TransferNode",
}
# BUILT-IN privilege groups expand at check time. The catalog mirrors
# constant.go: Collection{ReadOnly,ReadWrite,Admin} (:330-372),
# Database{ReadOnly,ReadWrite,Admin} (:374-396, note RenameCollection is
# database-admin, NOT collection-readwrite), Cluster{ReadOnly,ReadWrite,
# Admin} (:397-445).
_COLL_RO = {"Query", "Search", "IndexDetail", "GetLoadState",
            "ShowPartitions", "HasPartition", "GetStatistics"}
_COLL_RW = _COLL_RO | {"Insert", "Delete", "Upsert", "Import", "Flush",
                       "Compaction", "Load", "Release", "CreateIndex",
                       "DropIndex", "CreatePartition", "DropPartition"}
_DB_RO = {"ShowCollections", "DescribeDatabase", "DescribeCollection"}
_DB_RW = _DB_RO | {"AlterDatabase"}
_CLUSTER_RO = {"ListDatabases", "SelectUser", "ListPrivilegeGroups",
               "DescribeResourceGroup", "ListResourceGroups"}
_CLUSTER_RW = _CLUSTER_RO | {"FlushAll", "TransferNode", "TransferReplica",
                             "UpdateResourceGroups"}
PRIVILEGE_GROUPS = {
    "CollectionReadOnly": _COLL_RO,
    "CollectionReadWrite": _COLL_RW,
    "CollectionAdmin": _COLL_RW | {"CreateAlias", "DropAlias"},
    "DatabaseReadOnly": _DB_RO,
    "DatabaseReadWrite": _DB_RW,
    "DatabaseAdmin": _DB_RW | {"CreateCollection", "DropCollection",
                               "RenameCollection"},
    "ClusterReadOnly": _CLUSTER_RO,
    "ClusterReadWrite": _CLUSTER_RW,
    "ClusterAdmin": _CLUSTER_RW | {"CreateDatabase", "DropDatabase",
                                   "UpdateUser", "CreatePrivilegeGroup",
                                   "DropPrivilegeGroup",
                                   "OperatePrivilegeGroup", "BackupRBAC",
                                   "RestoreRBAC", "CreateResourceGroup",
                                   "DropResourceGroup"},
}

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]{0,31}$")


class RbacError(PermissionError):
    pass


def _hash_pw(pw: str) -> str:
    return hashlib.sha256(("msrbac:" + pw).encode()).hexdigest()


def _validate_name(name, kind: str) -> None:
    if not isinstance(name, str) or not _NAME_RE.match(name):
        raise ValueError(
            f"invalid {kind} name {name!r}: must start with a letter or "
            "underscore, contain only letters/digits/underscores, "
            "length 1-32"
        )


def _validate_password(pw) -> None:
    if not isinstance(pw, str) or not 6 <= len(pw) <= 256:
        raise ValueError("password must be a string of 6-256 characters")


class RbacStore:
    """Users/roles/grants persisted as one JSON file, enforced via check()."""

    def __init__(self, path: str):
        self.path = path
        if os.path.exists(path):
            with open(path) as f:
                self._s = json.load(f)
        else:
            self._s = {
                "users": {ROOT_USER: {"password": _hash_pw("Milvus"), "roles": []}},
                "roles": {ROLE_ADMIN: {"grants": []}, ROLE_PUBLIC: {"grants": []}},
            }
        self._normalize(self._s)

    @staticmethod
    def _normalize(state: dict) -> None:
        """Shared shape migration for load AND restore paths: ensure the
        privilege_groups map exists and migrate pre-v2 grants
        ([otype, oname, priv]) to db-scoped 4-tuples (v1 grants applied
        regardless of database → db "*")."""
        state.setdefault("privilege_groups", {})
        for r in state["roles"].values():
            r["grants"] = [g + ["*"] if len(g) == 3 else g for g in r["grants"]]

    def _save(self) -> None:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._s, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    # -- users ----------------------------------------------------------------
    def create_user(self, user: str, password: str) -> None:
        _validate_name(user, "user")
        _validate_password(password)
        if user in self._s["users"]:
            raise ValueError(f"user {user!r} exists")
        self._s["users"][user] = {"password": _hash_pw(password), "roles": []}
        self._save()

    def drop_user(self, user: str) -> None:
        if user == ROOT_USER:
            raise ValueError("cannot drop the root user")
        self._s["users"].pop(user, None)  # idempotent, like the reference
        self._save()

    def list_users(self) -> list[str]:
        return sorted(self._s["users"])

    def describe_user(self, user: str) -> dict:
        u = self._s["users"].get(user)
        if u is None:
            return {"user_name": user, "roles": ()}
        return {"user_name": user, "roles": tuple(sorted(u["roles"]))}

    def update_password(self, user: str, old: str, new: str) -> None:
        u = self._s["users"].get(user)
        if u is None:
            raise ValueError(f"user {user!r} not found")
        if u["password"] != _hash_pw(old):
            raise ValueError("old password mismatch")
        _validate_password(new)
        u["password"] = _hash_pw(new)
        self._save()

    def authenticate(self, user: str, password: str) -> None:
        u = self._s["users"].get(user)
        if u is None or u["password"] != _hash_pw(password):
            raise RbacError("auth check failure: invalid user or password")

    # -- roles ----------------------------------------------------------------
    def create_role(self, role: str) -> None:
        _validate_name(role, "role")
        if role in self._s["roles"]:
            raise ValueError(f"role {role!r} exists")
        self._s["roles"][role] = {"grants": []}
        self._save()

    def drop_role(self, role: str) -> None:
        if role in (ROLE_ADMIN, ROLE_PUBLIC):
            raise ValueError(f"cannot drop built-in role {role!r}")
        holders = [u for u, d in self._s["users"].items() if role in d["roles"]]
        if holders:
            # reference requires revoking from users first
            raise ValueError(f"role {role!r} is granted to users {holders}")
        self._s["roles"].pop(role, None)
        self._save()

    def alter_role(self, role: str, properties: dict) -> None:
        """AlterRole (rbac.go:110-115): attach key/value properties to a
        role (the reference uses it for role comments/annotations)."""
        r = self._s["roles"].get(role)
        if r is None:
            raise ValueError(f"role {role!r} not found")
        r.setdefault("properties", {}).update({str(k): str(v) for k, v in properties.items()})
        self._save()

    def list_roles(self) -> list[str]:
        return sorted(self._s["roles"])

    def describe_role(self, role: str) -> dict:
        r = self._s["roles"].get(role)
        if r is None:
            raise ValueError(f"role {role!r} not found")
        out = {"role": role, "privileges": tuple(tuple(g) for g in r["grants"])}
        if r.get("properties"):
            out["properties"] = dict(r["properties"])
        return out

    def grant_role(self, user: str, role: str) -> None:
        if user not in self._s["users"]:
            raise ValueError(f"user {user!r} not found")
        if role not in self._s["roles"]:
            raise ValueError(f"role {role!r} not found")
        roles = self._s["users"][user]["roles"]
        if role not in roles:
            roles.append(role)
            self._save()

    def revoke_role(self, user: str, role: str) -> None:
        roles = self._s["users"].get(user, {}).get("roles", [])
        if role in roles:
            roles.remove(role)
            self._save()

    # -- privileges -----------------------------------------------------------
    def grant_privilege(
        self, role: str, privilege: str, object_name: str = "*",
        object_type: str = "Collection", db_name: str = "*",
    ) -> None:
        if role not in self._s["roles"]:
            raise ValueError(f"role {role!r} not found")
        valid = (
            COLLECTION_PRIVS | GLOBAL_PRIVS | set(PRIVILEGE_GROUPS)
            | set(self._s["privilege_groups"])
        )
        if privilege not in valid:
            raise ValueError(f"unknown privilege {privilege!r}")
        g = [object_type, object_name, privilege, db_name]
        grants = self._s["roles"][role]["grants"]
        if g not in grants:
            grants.append(g)
            self._save()

    def revoke_privilege(
        self, role: str, privilege: str, object_name: str = "*",
        object_type: str = "Collection", db_name: str = "*",
    ) -> None:
        grants = self._s["roles"].get(role, {}).get("grants", [])
        g = [object_type, object_name, privilege, db_name]
        if g in grants:
            grants.remove(g)
            self._save()

    # -- privilege groups (v2: constant.go PrivilegeGroup surface) ------------
    def create_privilege_group(self, group: str) -> None:
        _validate_name(group, "privilege group")
        if (
            group in self._s["privilege_groups"]
            or group in PRIVILEGE_GROUPS
            or group in COLLECTION_PRIVS
            or group in GLOBAL_PRIVS
        ):
            raise ValueError(f"privilege group {group!r} conflicts with an "
                             "existing group or privilege")
        self._s["privilege_groups"][group] = []
        self._save()

    def drop_privilege_group(self, group: str) -> None:
        if group in PRIVILEGE_GROUPS:
            raise ValueError(f"cannot drop built-in group {group!r}")
        if group not in self._s["privilege_groups"]:
            raise ValueError(f"privilege group {group!r} not found")
        holders = [
            role
            for role, d in self._s["roles"].items()
            if any(g[2] == group for g in d["grants"])
        ]
        if holders:
            raise RbacError(
                f"privilege group {group!r} is granted to roles {holders}"
            )
        self._s["privilege_groups"].pop(group, None)
        self._save()

    def list_privilege_groups(self) -> dict:
        out = {k: tuple(sorted(v)) for k, v in PRIVILEGE_GROUPS.items()}
        out.update(
            {k: tuple(sorted(v)) for k, v in self._s["privilege_groups"].items()}
        )
        return out

    def add_privileges_to_group(self, group: str, privileges: list) -> None:
        g = self._s["privilege_groups"].get(group)
        if g is None:
            raise ValueError(f"privilege group {group!r} not found")
        for p in privileges:
            if p not in COLLECTION_PRIVS and p not in GLOBAL_PRIVS:
                raise ValueError(f"unknown privilege {p!r}")
            if p not in g:
                g.append(p)
        self._save()

    def remove_privileges_from_group(self, group: str, privileges: list) -> None:
        g = self._s["privilege_groups"].get(group)
        if g is None:
            raise ValueError(f"privilege group {group!r} not found")
        self._s["privilege_groups"][group] = [p for p in g if p not in privileges]
        self._save()

    # -- backup / restore (BackupRBAC / RestoreRBAC) --------------------------
    def backup(self) -> dict:
        return json.loads(json.dumps(self._s))

    def restore(self, data: dict) -> None:
        if not isinstance(data, dict) or "users" not in data or "roles" not in data:
            raise ValueError("invalid RBAC backup payload")
        self._s = json.loads(json.dumps(data))
        self._normalize(self._s)
        self._save()

    # -- enforcement ----------------------------------------------------------
    def check(
        self, user: str, privilege: str, object_name: str = "*",
        db_name: str = "default",
    ) -> None:
        """Raise RbacError unless ``user`` holds ``privilege`` on the object
        in the database (root and the admin role bypass — DefaultRoles).
        Grant names expand through built-in AND custom privilege groups; a
        grant's db scope "*" matches any database."""
        if user == ROOT_USER:
            return
        u = self._s["users"].get(user)
        if u is None:
            raise RbacError(f"unknown user {user!r}")
        roles = set(u["roles"]) | {ROLE_PUBLIC}
        if ROLE_ADMIN in roles:
            return
        custom = self._s["privilege_groups"]
        for role in roles:
            for otype, oname, priv, gdb in self._s["roles"].get(role, {}).get("grants", []):
                if oname not in ("*", object_name):
                    continue
                if gdb not in ("*", db_name):
                    continue
                if priv == "All" or priv == privilege:
                    return
                if privilege in PRIVILEGE_GROUPS.get(priv, ()):
                    return
                if privilege in custom.get(priv, ()):
                    return
        raise RbacError(
            f"permission denied: user {user!r} lacks {privilege} on "
            f"{object_name!r} in db {db_name!r}"
        )
