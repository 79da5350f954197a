"""Engine facade — entry point A of the reference (`execute_sql(str) ->
Cursor`, `integration/cpp/wrapper_dispatcher.cpp:91-118`).

`spark.sql` subsumes the reference's parse → transform → resolve → optimise →
execute lifecycle (SURVEY.md §3); this facade adds the PG-dialect rewrite,
table registration, and the cursor contract. Parameterised queries (``$1``
placeholders, reference `parameter_node_t`) map onto Spark's native
parameterised `spark.sql(query, args)`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from otterbrix_spark.catalog import Catalog
from otterbrix_spark.cursor import Cursor
from otterbrix_spark.dialect import rewrite
from otterbrix_spark.session import configure_session, get_spark
from otterbrix_spark.sources.registry import register_views


class Engine:
    def __init__(self, spark: SparkSession | None = None, table_dir: str | None = None):
        self.spark = spark or get_spark()
        configure_session(self.spark)
        self.catalog = Catalog(self.spark, table_dir)
        # PG prepared statements (reference parsenodes PrepareStmt /
        # ExecuteStmt / DeallocateStmt): name -> raw statement text with
        # $n placeholders, bound at EXECUTE time
        self._prepared: dict[str, str] = {}
        # parser extensions (reference parser_extension_t,
        # components/sql/parser/extension.hpp:24-43): name -> claim fn,
        # tried in registration order BEFORE built-in routing. Per-engine
        # registration, like the reference's per-dispatcher
        # add_parser_extension (test_parser_extension.cpp
        # "parser_extension_is_per_instance").
        self._extensions: dict = {}

    # -- parser extensions ----------------------------------------------------
    def register_extension(self, name: str, claim) -> None:
        """Register a claim-or-pass parser extension.

        ``claim(sql) -> DataFrame | None``: return a DataFrame to CLAIM
        the statement (the reference's successful parse), or None to pass
        it to the next extension / the built-in parser. An exception from
        a claim fn surfaces — that is the reference's transform-phase
        error, raised only after the extension recognized the statement.
        Extensions run in registration order; re-registering a name
        replaces its claim fn in place."""
        if not callable(claim):
            raise TypeError("claim must be callable(sql) -> DataFrame|None")
        self._extensions[name] = claim

    def unregister_extension(self, name: str) -> None:
        if name not in self._extensions:
            raise KeyError(f"no parser extension named {name!r}")
        del self._extensions[name]

    # -- catalog ------------------------------------------------------------
    def register_corpus(self, sf_dir: str) -> None:
        """Register the synthetic test corpus directory as temp views."""
        register_views(self.spark, sf_dir)

    def register(self, name: str, df: DataFrame) -> None:
        df.createOrReplaceTempView(name)

    # -- entry point A ------------------------------------------------------
    def execute_sql(self, sql: str, *params) -> Cursor:
        """PG-dialect SQL -> rewritten Spark SQL -> Cursor.

        ``$1``-style positional parameters are bound via Spark's native
        parameterised SQL (constants extracted exactly like the reference's
        parameter_node_t). Semicolon-separated multi-statement batches run
        sequentially (reference operator_sequence/operator_batch); the last
        statement's cursor is returned.
        """
        # parser extensions get the RAW statement first — BEFORE the
        # semicolon splitter, so a custom grammar containing ';' sees the
        # full text (the reference tries registered extensions before its
        # built-in PG parser, extension.hpp). First claim wins, a pass
        # falls through, and a parse failure surfaces only if nobody —
        # extension or built-in — claims. Snapshot the claim list: a
        # claim fn may (un)register extensions mid-claim.
        for claim in list(self._extensions.values()):
            claimed = claim(sql)
            if claimed is not None:
                return Cursor(claimed)
        statements = _split_statements(sql)
        if len(statements) > 1:
            cur = None
            for stmt in statements:
                cur = self.execute_sql(stmt, *params)
            return cur
        handled = self._prepared_statement(sql, params)
        if handled is not None:
            return handled
        handled = self._explain_statement(sql, params)
        if handled is not None:
            return handled
        body = self.catalog.rewrite_domain_casts(
            self.catalog.canonicalize(rewrite(sql))
        )
        if params:
            if self.catalog.handles(body):
                # routed statements (DML/DDL on managed tables, SET ...) go
                # through the Catalog, which has no parameter binder — inline
                # the literals exactly as the reference's parameter_node_t
                # folds constants into the plan
                import re

                body = re.sub(
                    r"\$(\d+)",
                    lambda m: _sql_literal(params[int(m.group(1)) - 1]),
                    body,
                )
                return self._route(body)
            import re

            body = re.sub(r"\$(\d+)", lambda m: f":p{m.group(1)}", body)
            args = {f"p{i + 1}": v for i, v in enumerate(params)}
            return Cursor(self.spark.sql(body, args=args))
        if self.catalog.handles(body):
            return self._route(body)
        return Cursor(self.spark.sql(body))

    # statement heads that can never mutate catalog metadata or table
    # state: cursor traffic and txn bookkeeping. Row-at-a-time cursor
    # loops (FETCH + positioned DML per row) must not pay a JSON write +
    # per-view re-analysis per FETCH (self-review r10).
    _NON_MUTATING_HEADS = (
        "FETCH", "MOVE", "CLOSE", "DECLARE", "BEGIN", "SAVEPOINT",
        "RELEASE", "SELECT", "EXPLAIN", "SET TIME", "SHOW",
    )

    def _route(self, body: str) -> Cursor:
        """Route through the catalog, then persist the catalog dicts and
        re-register late-binding views — the statement boundary where
        every DDL/sequence mutation is already applied (reference
        persistence: a reopened engine over the same table_dir sees
        tables, constraints, sequences, types and views;
        `test_persistence.cpp`). Non-mutating statements skip both.

        Two boundary subtleties (ADVICE r10): a routed ``SELECT
        nextval('s')`` mutates sequence state despite its SELECT head, so
        sequence-consuming statements always persist; and while an
        explicit transaction is open, persistence is DEFERRED to the
        COMMIT/ROLLBACK boundary — an eager per-statement write would
        leave in-txn DDL visible to a reopened engine after a pre-COMMIT
        crash, contradicting transactional-DDL rollback. View refresh
        still runs per in-txn statement (read-your-writes through views
        reads the staged temp views)."""
        import re

        cur = Cursor(self.catalog.route(body))
        head = body.lstrip()[:9].upper()
        mutating = not head.startswith(self._NON_MUTATING_HEADS)
        if not mutating and re.search(
            r"\bnextval\s*\(", body, re.IGNORECASE
        ):
            mutating = True
        if mutating:
            if self.catalog._txn is None:
                # ON COMMIT DELETE ROWS under autocommit: the statement's
                # implicit commit empties any delete-mode temp table the
                # DML touched, before the boundary persists (PG parity —
                # ADVICE r12)
                if any(
                    m == "delete"
                    for m in self.catalog.temp_tables.values()
                ):
                    self.catalog.implicit_commit_temp_sweep(body)
                self.catalog.persist_catalog_state()
            if head.startswith(("COMMIT", "ROLLBACK", "ABORT")):
                # staged frames were swapped out / discarded — every view
                # bound to them during the txn must re-bind to disk state
                self.catalog.refresh_views()
            else:
                self.catalog.refresh_views(statement=body)
        return cur

    def sql(self, sql: str, *params) -> DataFrame:
        return self.execute_sql(sql, *params).df

    # -- EXPLAIN (PG's plan-inspection statement) ----------------------------
    def _explain_statement(self, sql: str, params) -> "Cursor | None":
        """Route ``EXPLAIN [ANALYZE] <query>``; None if not an EXPLAIN.

        PG prints its planner tree; here the underlying query runs through
        the normal dialect/catalog path and the CATALYST plan is returned,
        one line per row in a single ``plan`` column — so a reference user's
        EXPLAIN habit works and shows the engine they are actually on.
        ``EXPLAIN ANALYZE`` uses Spark's "cost" mode (adds statistics);
        plain EXPLAIN uses "formatted" (physical operators + details,
        where PushedFilters/ReadSchema pruning is visible).

        Execution semantics follow PG: only ``EXPLAIN ANALYZE`` actually
        applies a DML statement. Plain ``EXPLAIN`` of catalog-routed
        INSERT/UPDATE/DELETE/MERGE stages the write inside a discarded
        implicit transaction (the table is untouched); plain EXPLAIN of a
        routed CTAS / CREATE MATERIALIZED VIEW plans its source query
        without creating the table; other routed utility statements
        (TRUNCATE, ALTER, SET, ...) refuse, as PG's grammar does."""
        import re

        m = re.match(
            r"^\s*EXPLAIN\s+(ANALYZE\s+)?(.+)$", sql,
            re.IGNORECASE | re.DOTALL,
        )
        if m is None:
            return None
        if m.group(1):
            inner = self.execute_sql(m.group(2).strip(), *params)
        else:
            inner, pre_rendered = self._explain_only(
                m.group(2).strip(), params
            )
            if pre_rendered:
                return inner  # already one plan line per row
        jvm = self.spark.sparkContext._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "cost" if m.group(1) else "formatted"
        )
        text = inner.df._jdf.queryExecution().explainString(mode)
        rows = [(line,) for line in text.splitlines() if line.strip()]
        return Cursor(
            self.spark.createDataFrame(rows, "plan STRING")
        )

    def _explain_only(self, sql: str, params) -> "tuple[Cursor, bool]":
        """Plan a statement WITHOUT applying it (plain ``EXPLAIN``).

        Returns (cursor, pre_rendered): when ``pre_rendered`` the cursor
        already holds one plan line per row (the native-EXPLAIN fallback
        for DML on tables the Catalog does not manage — Spark runs DML
        commands eagerly on ``spark.sql``, so the only plan-without-write
        path there is Spark's own EXPLAIN statement).

        Routing: ``EXECUTE name(args)`` binds the prepared text first
        (PG's EXPLAIN EXECUTE); catalog-routed DML on managed tables goes
        through ``Catalog.explain_route`` (staged in a discarded implicit
        transaction, sequence state restored); a SELECT carrying
        nextval()/currval() plans with a NON-CONSUMING peek substitution
        (PG never evaluates nextval under plain EXPLAIN); CTAS-family
        statements plan their source SELECT; every other catalog-routed
        statement is a utility statement PG's EXPLAIN grammar refuses —
        raising is strictly better than the old behaviour, which eagerly
        EXECUTED it."""
        import re

        mex = re.match(
            r"^\s*EXECUTE\s+([A-Za-z_]\w*)\s*(?:\((.*)\))?\s*;?\s*$",
            sql, re.IGNORECASE | re.DOTALL,
        )
        if mex:
            bound = self._bind_prepared(
                mex.group(1).lower(), mex.group(2), params
            )
            return self._explain_only(bound, params)
        body = self.catalog.rewrite_domain_casts(
            self.catalog.canonicalize(rewrite(sql))
        )
        if params:
            body = re.sub(
                r"\$(\d+)",
                lambda mm: _sql_literal(params[int(mm.group(1)) - 1]),
                body,
            )
        if not self.catalog.handles(body):
            # classify by the first CODE token: a leading comment must not
            # make a SELECT look like a utility statement (self-review r9)
            probe = body
            while True:
                probe = probe.lstrip()
                if probe.startswith("--"):
                    probe = probe.split("\n", 1)[1] if "\n" in probe else ""
                elif probe.startswith("/*") and "*/" in probe:
                    probe = probe.split("*/", 1)[1]
                else:
                    break
            if probe.lstrip().upper().startswith(
                ("SELECT", "WITH", "VALUES", "(", "TABLE ")
            ):
                return Cursor(self.spark.sql(body)), False
            # anything else Spark would run EAGERLY on spark.sql (SET k=v,
            # CACHE TABLE, ANALYZE TABLE, DROP NAMESPACE, ...) — commands,
            # not queries. Refuse like the routed-utility branch below:
            # plain EXPLAIN must never execute (ADVICE r8).
            raise ValueError(
                "EXPLAIN cannot plan a utility statement without "
                "executing it (PG accepts only SELECT/VALUES/DML/CTAS "
                "under EXPLAIN); use EXPLAIN ANALYZE to execute and "
                "profile it"
            )
        head = body.lstrip().upper()
        from otterbrix_spark.catalog import _parse_with_dml

        if head.startswith("WITH") and _parse_with_dml(body):
            # data-modifying CTEs: the discarded-txn probe stages every
            # sub-statement lazily (zero jobs) and plans the main query
            # over the staged snapshot
            return Cursor(self.catalog.explain_route(body)), False
        if head.startswith(("INSERT", "UPDATE", "DELETE", "MERGE")):
            target = re.match(
                r"^\s*(?:INSERT\s+INTO|UPDATE|DELETE\s+FROM|MERGE\s+INTO)"
                r"\s+([\w.]+)",
                body, re.IGNORECASE,
            )
            name = target.group(1) if target else ""
            if name in self.catalog.tables or name in self.catalog.dynamic:
                # dynamic tables stage per-txn batches too (round 8), so
                # the discarded-txn probe protects both kinds of table
                return Cursor(self.catalog.explain_route(body)), False
            # not a managed table: route() would fall through to
            # spark.sql, which EXECUTES DML commands eagerly — delegate
            # to Spark's own EXPLAIN, the plan-only path for native tables
            return (
                Cursor(self.spark.sql("EXPLAIN FORMATTED " + body)),
                True,
            )
        if head.startswith(("SELECT", "WITH", "VALUES", "(")):
            # handles() fired on nextval()/currval() in a query position:
            # peek the current values WITHOUT consuming (PG plans the call,
            # it does not evaluate it under plain EXPLAIN)
            def _peek(mm: re.Match) -> str:
                seq = mm.group(1).replace(".", "__")
                if seq not in self.catalog.sequences:
                    # PG errors at plan time for an unknown sequence too
                    raise ValueError(f"unknown sequence: {seq}")
                return str(self.catalog.sequences[seq])

            peeked = re.sub(
                r"\b(?:nextval|currval)\s*\(\s*'([\w.]+)'\s*\)",
                _peek, body, flags=re.IGNORECASE,
            )
            return Cursor(self.spark.sql(peeked)), False
        m = re.match(
            r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:MATERIALIZED\s+)?"
            r"(?:TABLE|VIEW)\s+[\w.]+\s+AS\s+(.+)$",
            body,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            return self._explain_only(m.group(1).strip(), ())
        raise ValueError(
            "EXPLAIN cannot plan a utility statement without executing it "
            "(PG accepts only SELECT/VALUES/DML/CTAS under EXPLAIN); "
            "use EXPLAIN ANALYZE to execute and profile it"
        )

    # -- prepared statements (PG PREPARE / EXECUTE / DEALLOCATE) ------------
    def _prepared_statement(self, sql: str, params) -> "Cursor | None":
        """Route PREPARE / EXECUTE / DEALLOCATE; None if ``sql`` is neither.

        PG semantics (reference grammar PrepareStmt/ExecuteStmt nodes):
        PREPARE stores the statement TEXT with its $n placeholders — any
        optional parameter-type list is accepted and ignored, since Spark's
        binder infers types; EXECUTE folds the call's literal arguments
        into the $n slots (the reference's parameter_node_t constant
        folding) and runs the stored text through the normal path, so
        prepared DML, DDL and SELECT all work; re-PREPARE of a live name
        errors as in PG; DEALLOCATE [ALL] drops."""
        import re

        m = re.match(
            r"^\s*PREPARE\s+([A-Za-z_]\w*)\s*(?:\(([^)]*)\))?\s+AS\s+(.+)$",
            sql,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            name = m.group(1).lower()
            if name in self._prepared:
                raise ValueError(
                    f'prepared statement "{name}" already exists'
                )
            self._prepared[name] = m.group(3).strip().rstrip(";")
            return Cursor(
                self.spark.sql(f"SELECT '{name}' AS prepared LIMIT 0")
            )
        m = re.match(
            r"^\s*EXECUTE\s+([A-Za-z_]\w*)\s*(?:\((.*)\))?\s*;?\s*$",
            sql,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            body = self._bind_prepared(m.group(1).lower(), m.group(2), params)
            return self.execute_sql(body, *params)
        m = re.match(
            r"^\s*DEALLOCATE\s+(?:PREPARE\s+)?(ALL|[A-Za-z_]\w*)\s*;?\s*$",
            sql,
            re.IGNORECASE,
        )
        if m:
            name = m.group(1).lower()
            if name == "all":
                self._prepared.clear()
            elif self._prepared.pop(name, None) is None:
                raise ValueError(f'prepared statement "{name}" does not exist')
            return Cursor(self.spark.sql("SELECT 'ok' AS deallocated LIMIT 0"))
        return None

    def _bind_prepared(self, name: str, argstr, params) -> str:
        """Fold an EXECUTE call's literal arguments into the stored
        prepared text's ``$n`` slots and return the bound statement.

        Parameter-count discipline (PG's "wrong number of parameters"):
        the max ``$n`` referenced must be covered by the call's argument
        list — checked even for the ZERO-argument ``EXECUTE name`` form
        (unless the engine-level ``*params`` will bind them downstream,
        the supported pass-through combination)."""
        import re

        if name not in self._prepared:
            raise ValueError(f'prepared statement "{name}" does not exist')
        body = self._prepared[name]
        from otterbrix_spark.catalog import _split_top_level
        from otterbrix_spark.dialect import (
            _protect_strings,
            _restore_strings,
        )

        args = [
            a.strip() for a in _split_top_level(argstr or "") if a.strip()
        ]
        protected, lits = _protect_strings(body)
        refs = [int(x) for x in re.findall(r"\$(\d+)", protected)]
        if refs and max(refs) > len(args) and (args or not params):
            raise ValueError(
                f'wrong number of parameters for prepared statement '
                f'"{name}": expected {max(refs)}, got {len(args)}'
            )
        if not args:
            return body
        # simple literals substitute bare so downstream dialect rules
        # that pattern-match literal operands (e.g. `~ '<re>'`) still
        # fire; anything else gets defensive parens
        simple = re.compile(
            r"'(?:[^']|'')*'|[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?"
            r"|NULL|TRUE|FALSE",
            re.IGNORECASE,
        )

        def bind(mm: re.Match) -> str:
            arg = args[int(mm.group(1)) - 1]
            return arg if simple.fullmatch(arg) else f"({arg})"

        return _restore_strings(re.sub(r"\$(\d+)", bind, protected), lits)

    # -- entry point B bridge ----------------------------------------------
    def from_df(self, obj, name: str | None = None):
        from otterbrix_spark.relation import from_df

        rel = from_df(obj, spark=self.spark)
        if name:
            rel.df.createOrReplaceTempView(name)
        return rel


def _sql_literal(value) -> str:
    """Render a Python value as a SQL literal (for routed-statement binding)."""
    if value is None:
        return "NULL"
    if isinstance(value, bool):  # before int: bool is an int subclass
        return "TRUE" if value else "FALSE"
    if isinstance(value, float):
        # repr() of non-finite floats ('inf', 'nan') is not valid SQL
        if value != value:
            return "CAST('NaN' AS DOUBLE)"
        if value == float("inf"):
            return "CAST('Infinity' AS DOUBLE)"
        if value == float("-inf"):
            return "CAST('-Infinity' AS DOUBLE)"
        return repr(value)
    if isinstance(value, int):
        return repr(value)
    # Spark treats backslash as an escape inside string literals — double it
    # before quote-doubling so a trailing '\' can't swallow the closing quote
    return "'" + str(value).replace("\\", "\\\\").replace("'", "''") + "'"


def _only_comments(stmt: str) -> bool:
    """True when a segment contains nothing but comments/whitespace (e.g.
    a trailing `/* ... */` after the final ';') — not a statement."""
    import re

    stripped = re.sub(r"--[^\n]*", "", stmt)
    stripped = re.sub(r"/\*.*?\*/", "", stripped, flags=re.DOTALL)
    return not stripped.strip()


def _split_statements(sql: str) -> list[str]:
    """Split a batch on top-level semicolons — string-literal AND
    comment-aware: a ';' inside '...', a `--` line comment, or a `/* */`
    block comment never splits the batch (comments are preserved verbatim;
    Spark's parser accepts both forms). Comment-only segments are dropped."""
    import re as _re

    out: list[str] = []
    cur = ""
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "$":  # PG dollar-quoted string: $tag$ ... $tag$
            m = _re.match(r"\$[A-Za-z_]\w*\$|\$\$", sql[i:])
            if m:
                tag = m.group(0)
                j = sql.find(tag, i + len(tag))
                j = n if j == -1 else j + len(tag)
                cur += sql[i:j]
                i = j
                continue
        if ch == "'":  # string literal; '' is an escaped quote inside it
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            cur += sql[i : j + 1]
            i = j + 1
            continue
        if ch == "-" and sql[i : i + 2] == "--":  # line comment
            j = sql.find("\n", i)
            j = n if j == -1 else j
            cur += sql[i:j]
            i = j
            continue
        if ch == "/" and sql[i : i + 2] == "/*":  # block comment
            j = sql.find("*/", i + 2)
            j = n if j == -1 else j + 2
            cur += sql[i:j]
            i = j
            continue
        if ch == ";":
            if cur.strip() and not _only_comments(cur):
                out.append(cur.strip())
            cur = ""
            i += 1
            continue
        cur += ch
        i += 1
    if cur.strip() and not _only_comments(cur):
        out.append(cur.strip())
    return out


def connect(spark: SparkSession | None = None) -> Engine:
    """Mirror of the reference Python `connect()` entry point."""
    return Engine(spark)


def explain_sql(engine: Engine, sql: str, mode: str = "formatted") -> str:
    """EXPLAIN facade: rewritten-dialect SQL -> physical plan text."""
    df = engine.sql(sql)
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)
