"""Systematic port of the reference MV rewrite hit/miss matrix
(test/.../rules/RewriteQueryByMaterialViewBase.scala, 1127 lines — all
four suite classes, every query case).

Fidelity: the reference's tables, views, and query texts are
reproduced 1:1 (table paths become registered names); each case pins
the reference's expected HIT or MISS, and every case — hit or miss —
additionally pins answer correctness against direct execution of the
original SQL (the reference's checkAnswer). Cases where this engine
legitimately rewrites MORE than the reference (a semantically valid
rewrite its matcher missed) are marked SUPERSET: either outcome
accepted, answers enforced.

Scoreboard (kept in sync with COVERAGE.md §MV): 43 query cases — 27
reference hits (all hit here), 15 reference misses (all miss here),
1 superset case where this engine hits a correct rewrite the
reference's matcher refuses (group-determined predicate under the
aggregate).
"""

import shutil

import pytest

from starlake_spark.plans import mv
from starlake_spark.sql import StarSession

HIT, MISS, SUPERSET = "hit", "miss", "superset"


def _mk_session(spark, base, views: dict[str, str]):
    s = StarSession(spark, warehouse=str(base / "wh"))
    t1 = spark.createDataFrame(
        [(1, "a", 11), (2, "b", 11), (3, "c", 11), (4, "d", 11)],
        "key int, value string, range int")
    s.create_table(t1, str(base / "tab1"), name="tab1",
                   range_partitions=["range"], hash_partitions=["key"],
                   hash_bucket_num=2)
    t2 = spark.createDataFrame(
        [(1, "aa", 22), (3, "cc", 22), (5, "ee", 22), (6, "ff", 22)],
        "key int, value string, range int")
    s.create_table(t2, str(base / "tab2"), name="tab2")
    t3 = spark.createDataFrame(
        [(1, "a", "a2", 22), (3, "c", "c2", 22), (5, "e", "e2", 22),
         (6, "f", "f2", 22), (1, "a", "a3", 33), (4, "d", "d3", 33),
         (5, "e", "e3", 33), (6, "f", "f3", 33)],
        "k1 int, k2 string, value string, range int")
    s.create_table(t3, str(base / "tab3"), name="tab3",
                   range_partitions=["range"])
    for name, sql in views.items():
        s.create_material_view(name, str(base / name), sql)
    return s


def _rows(df):
    def norm(v):
        return tuple(sorted(v)) if isinstance(v, list) else v

    return sorted(tuple(norm(v) for v in r) for r in df.collect())


def _check(sess, sql, expect):
    hit = mv.try_rewrite(sess, sql)
    if expect == HIT:
        assert hit is not None, f"expected rewrite hit:\n{sql}"
    elif expect == MISS:
        assert hit is None, f"expected no rewrite:\n{sql}"
    # SUPERSET: reference misses; a hit here is a valid extra rewrite
    if hit is not None:
        assert _rows(hit) == _rows(sess.spark.sql(sql)), \
            f"rewritten answers diverge from direct execution:\n{sql}"
    return hit is not None


# --------------------------------------------------------------------------
# Suite 1: SimpleRewriteWithSingleTable (view1 over tab1)
# --------------------------------------------------------------------------

VIEW1 = """
select a.key,value,range,length(range) as lr,
concat_ws(',',key,a.value,'something') as cw
from tab1 a
where range>=5 and range<30
"""

SINGLE_CASES = [
    # (case id / reference test name, query, expected)
    ("same query", VIEW1, HIT),
    ("short table name",  # name-resolution path; same text here
     VIEW1, HIT),
    ("range condition both sides exchanged", """
     select a.key,value,range,length(range) as lr,
     concat_ws(',',key,a.value,'something') as cw
     from tab1 a where 5<=range and 30>range
     """, HIT),
    ("different column name", """
     select a.key,value,range,length(range) as cw,
     concat_ws(',',key,a.value,'something') as lr
     from tab1 a where range>=5 and range<30
     """, HIT),
    ("large range interval (open)", """
     select key from tab1 a where range>=5
     """, MISS),
    ("large range interval (wider bound)", """
     select key from tab1 a where range>=5 and range<=30
     """, MISS),
    ("subset range interval (strict)", """
     select key from tab1 a where range>5 and range<30
     """, HIT),
    ("subset range interval (tighter)", """
     select key from tab1 a where range>7 and range<=20
     """, HIT),
    ("external condition (key)", """
     select key from tab1 a where range>5 and range<30 and key > 2
     """, HIT),
    ("external condition (or values)", """
     select key from tab1 a
     where range>7 and range<=20 and (value='b' or value='d')
     """, HIT),
    ("external or condition", """
     select a.key,value,range,length(range) as lr,
     concat_ws(',',key,a.value,'something') as cw
     from tab1 a where range>=5 and range<30 and (key=1 or key>=3)
     """, HIT),
]


@pytest.fixture(scope="module")
def single_sess(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("mv_single")
    s = _mk_session(spark, base, {"material_view1": VIEW1})
    yield s
    shutil.rmtree(base, ignore_errors=True)


@pytest.mark.parametrize("name,sql,expect",
                         SINGLE_CASES, ids=[c[0] for c in SINGLE_CASES])
def test_single_table_matrix(single_sess, name, sql, expect):
    _check(single_sess, sql, expect)


# --------------------------------------------------------------------------
# Suite 2: RewriteWithJoinCondition (view2: two-table join; view5:
# join over a nested derived-table join)
# --------------------------------------------------------------------------

VIEW2 = """
select a.key as a_key,a.value a_value,a.range a_range,
b.key b_key,b.value b_value,b.range b_range,
length(b.range) as lr,
concat_ws(',',a.key,a.value,'something') as cw
from tab1 a join tab2 b on a.key=b.key
where a.range>=2 and b.range<30 and b.value='cc'
"""

VIEW5 = """
select a.key as a_key,a.value a_value,a.range a_range,
b.t1_value b_t1_value,b.t2_value,b.range b_range
from tab1 a join
(select t1.key,t2.k2,t1.value t1_value,t2.value t2_value,t2.range range
 from tab2 t1 join
  (select * from tab3 where range>10) t2
 on t1.key=t2.k1) b
on a.key=b.key
where a.range>=5
"""

JOIN_CASES = [
    ("same query - join", VIEW2, HIT),
    ("external condition - join", """
     select a.key as a_key,a.value a_value,a.range a_range,
     b.key b_key,b.value b_value,b.range b_range,
     length(b.range) as lr,
     concat_ws(',',a.key,a.value,'something') as cw
     from tab1 a join tab2 b on a.key=b.key
     where a.range>2 and b.range<25 and b.value='cc' and a.value='c'
     """, HIT),
    ("less condition - join", """
     select a.key as a_key,a.value a_value,a.range a_range,
     b.key b_key,b.value b_value,b.range b_range,
     length(b.range) as lr,
     concat_ws(',',a.key,a.value,'something') as cw
     from tab1 a join tab2 b on a.key=b.key
     where a.range>2 and b.range<25
     """, MISS),
    ("same query - multi table inner join", VIEW5, HIT),
    ("external condition in on - multi table inner join", """
     select a.key as a_key,a.value a_value,a.range a_range,
     b.t1_value b_t1_value,b.t2_value,b.range b_range
     from tab1 a join
     (select t1.key,t2.k2,t1.value t1_value,t2.value t2_value,
             t2.range range
      from tab2 t1 join
       (select * from tab3 where range>10) t2
      on t1.key=t2.k1 and t1.key<10) b
     on a.key=b.key and b.t2_value!='a2'
     where a.range>=5
     """, HIT),
    ("less condition - multi table inner join", """
     select a.key as a_key,a.value a_value,a.range a_range,
     b.t1_value b_t1_value,b.t2_value,b.range b_range
     from tab1 a join
     (select t1.key,t2.k2,t1.value t1_value,t2.value t2_value,
             t2.range range
      from tab2 t1 join
       (select * from tab3 where range>10) t2
      on t1.key=t2.k1) b
     on a.key=b.key
     """, MISS),
]


@pytest.fixture(scope="module")
def join_sess(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("mv_join")
    s = _mk_session(spark, base, {"material_view2": VIEW2,
                                  "material_view5": VIEW5})
    yield s
    shutil.rmtree(base, ignore_errors=True)


@pytest.mark.parametrize("name,sql,expect",
                         JOIN_CASES, ids=[c[0] for c in JOIN_CASES])
def test_join_matrix(join_sess, name, sql, expect):
    _check(join_sess, sql, expect)


# --------------------------------------------------------------------------
# Suite 3: RewriteWithAggregateCondition (view3: single-table agg;
# view4: agg over left join; view6: agg over comma multi-join)
# --------------------------------------------------------------------------

VIEW3 = """
select a.k1 a_k1,a.k2 a_k2,collect_list(a.value) a_value,
max(a.range) a_range
from tab3 a
where a.range>=2
group by a.k1,a.k2 having a.k1 > 1
"""

VIEW4 = """
select a.key as a_key,max(a.value) a_value,last(a.range) a_range,
min(b.value) b_value
from tab1 a left join tab2 b on a.key=b.key
where a.range>=2
group by a.key having a.key > 1
"""

VIEW6 = """
select max(a.key) as a_key,min(a.value) a_value,first(a.range) a_range,
last(b.value) b_value,last(b.range) b_range,
c.k1,c.k2,collect_list(c.value) c_value,collect_list(c.range) c_range
from tab1 a,tab2 b,tab3 c
where a.key=b.key and b.key=c.k1 and a.range>=5 and c.range>10
group by c.k1,c.k2
"""

AGG_CASES = [
    ("same query - aggregate", VIEW3, HIT),
    ("external having condition - aggregate", """
     select a.k1 a_k1,a.k2 a_k2,collect_list(a.value) a_value,
     max(a.range) a_range
     from tab3 a where a.range>=2
     group by a.k1,a.k2 having a.k1 > 1 and a.k2='d'
     """, HIT),
    # Reference MISSES this (its matcher refuses any extra filter under
    # the aggregate); k2 is a GROUPING column, so the predicate is
    # group-determined and compensating on the view is semantically
    # exact — this engine hits, answers enforced.
    ("external condition under aggregate - aggregate", """
     select a.k1 a_k1,a.k2 a_k2,collect_list(a.value) a_value,
     max(a.range) a_range
     from tab3 a where a.range>=2 and a.k2='d'
     group by a.k1,a.k2 having a.k1 > 1
     """, SUPERSET),
    ("same query - aggregate & left join", VIEW4, HIT),
    ("external having condition - aggregate & left join", """
     select a.key as a_key,max(a.value) a_value,last(a.range) a_range,
     min(b.value) b_value
     from tab1 a left join tab2 b on a.key=b.key
     where a.range>=2
     group by a.key having a.key>1 and min(b.value)='cc'
     """, HIT),
    ("external condition under aggregate - aggregate & left join", """
     select a.key as a_key,max(a.value) a_value,last(a.range) a_range,
     min(b.value) b_value
     from tab1 a left join tab2 b on a.key=b.key
     where a.range>=2 and b.value='c'
     group by a.key having a.key>1
     """, MISS),
    ("external join condition - aggregate & left join", """
     select a.key as a_key,max(a.value) a_value,last(a.range) a_range,
     min(b.value) b_value
     from tab1 a left join tab2 b on a.key=b.key and b.value='c'
     where a.range>=2
     group by a.key having a.key>1
     """, MISS),
    ("same query - aggregate & multi join", VIEW6, HIT),
    ("having condition - aggregate & multi join", """
     select max(a.key) as a_key,min(a.value) a_value,
     first(a.range) a_range,
     last(b.value) b_value,last(b.range) b_range,
     c.k1,c.k2,collect_list(c.value) c_value,
     collect_list(c.range) c_range
     from tab1 a,tab2 b,tab3 c
     where a.key=b.key and b.key=c.k1 and a.range>=5 and c.range>10
     group by c.k1,c.k2
     having min(a.value)='c'
     """, HIT),
    ("external condition under aggregate - aggregate & multi join", """
     select max(a.key) as a_key,min(a.value) a_value,
     first(a.range) a_range,
     last(b.value) b_value,last(b.range) b_range,
     c.k1,c.k2,collect_list(c.value) c_value,
     collect_list(c.range) c_range
     from tab1 a,tab2 b,tab3 c
     where a.key=b.key and b.key=c.k1 and a.range>=5 and c.range>10
           and a.value='c'
     group by c.k1,c.k2
     """, MISS),
]


@pytest.fixture(scope="module")
def agg_sess(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("mv_agg")
    s = _mk_session(spark, base, {"material_view3": VIEW3,
                                  "material_view4": VIEW4,
                                  "material_view6": VIEW6})
    yield s
    shutil.rmtree(base, ignore_errors=True)


@pytest.mark.parametrize("name,sql,expect",
                         AGG_CASES, ids=[c[0] for c in AGG_CASES])
def test_aggregate_matrix(agg_sess, name, sql, expect):
    _check(agg_sess, sql, expect)


# --------------------------------------------------------------------------
# Suite 4: RewriteWithOrCondition (view7: 3-disjunct OR filter;
# view8: OR conjoined with a plain condition)
# --------------------------------------------------------------------------

OR_SELECT = """
select a.k1,k2,value,range,length(range) as lr,
concat_ws(',',k1,k2,a.value) as cw
from tab3 a
"""

VIEW7 = OR_SELECT + """
where (k1>1 and range>=30) or (k1<=3 and range<25 and value!='a2') or k1=5
"""

VIEW8 = """
select a.k1,k2,value,range,length(range) as lr
from tab3 a
where ((k1>1 and range>=30) or (k1<=3 and range<25 and value!='a2')
       or k1=1) and k1>=0
"""

OR_CASES = [
    ("same query - or", VIEW7, HIT),
    ("less or condition - or",
     OR_SELECT + "where (k1>1 and range>=30) or k1=5", HIT),
    ("or condition inbounds - or",
     OR_SELECT + """where (k1>2 and range>30 and value='e3')
                       or (k1<3 and range<24 and value!='a2')""", HIT),
    ("without or condition inbounds - or",
     OR_SELECT + "where k1>1 and range>=30", HIT),
    ("without or condition inbounds (equal replace range) - or",
     OR_SELECT + "where k1=4 and range>=30", HIT),
    ("more or condition - or",
     OR_SELECT + """where (k1>1 and range>=30)
                       or (k1<=3 and range<25 and value!='a2')
                       or k1=5 or k1=4""", MISS),
    ("or condition not inbounds - or",
     OR_SELECT + """where (k1>0 and range>=30)
                       or (k1<=3 and range<25 and value!='a2')
                       or k1=5""", MISS),
    ("without or condition not inbounds - or",
     OR_SELECT + "where k1=0 and range>=30", MISS),
    ("without condition - or", OR_SELECT, MISS),
    ("same query - or & and", """
     select a.k1,k2,value,range,length(range) as lr
     from tab3 a
     where ((k1>1 and range>=30) or (k1<=3 and range<25 and value!='a2')
            or k1=1) and k1>=0
     """, HIT),
    ("external condition - or & and", """
     select a.k1,k2,value,range,length(range) as lr
     from tab3 a
     where ((k1<=3 and range<25 and value!='a2' and k2='c') or k1=1)
           and k1>=0
     """, HIT),
    ("without or condition inbounds - or & and", """
     select a.k1,k2,value,range,length(range) as lr
     from tab3 a where k1=1
     """, HIT),
    ("or condition not inbounds - or & and", """
     select a.k1,k2,value,range,length(range) as lr
     from tab3 a
     where ((k1>1 and range>=30) or (k1<=4 and range<25 and value!='a2')
            or k1=1) and k1>=0
     """, MISS),
    ("without or condition not inbounds - or & and", """
     select a.k1,k2,value,range,length(range) as lr
     from tab3 a where k1=5
     """, MISS),
    ("without condition - or & and", """
     select a.k1,k2,value,range,length(range) as lr
     from tab3 a
     """, MISS),
    ("just and condition - or & and", """
     select a.k1,k2,value,range,length(range) as lr
     from tab3 a where k1>=0
     """, MISS),
]


@pytest.fixture(scope="module")
def or7_sess(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("mv_or7")
    s = _mk_session(spark, base, {"material_view7": VIEW7})
    yield s
    shutil.rmtree(base, ignore_errors=True)


@pytest.fixture(scope="module")
def or8_sess(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("mv_or8")
    s = _mk_session(spark, base, {"material_view8": VIEW8})
    yield s
    shutil.rmtree(base, ignore_errors=True)


@pytest.mark.parametrize("name,sql,expect",
                         [c for c in OR_CASES if not c[0].endswith("& and")],
                         ids=[c[0] for c in OR_CASES
                              if not c[0].endswith("& and")])
def test_or_matrix(or7_sess, name, sql, expect):
    _check(or7_sess, name and sql, expect)


@pytest.mark.parametrize("name,sql,expect",
                         [c for c in OR_CASES if c[0].endswith("& and")],
                         ids=[c[0] for c in OR_CASES
                              if c[0].endswith("& and")])
def test_or_and_matrix(or8_sess, name, sql, expect):
    _check(or8_sess, sql, expect)


def test_outer_join_filter_position_never_conflated(spark,
                                                    tmp_path_factory):
    """Regression (round-5 self-review): a filter UNDER a left join's
    null-supplying side is NOT the same query as the filter in the
    WHERE clause — `a LEFT JOIN (SELECT.. WHERE v='cc') b` keeps
    null-extended a-rows the WHERE form drops. Null-side filters are
    outside the rewritable subset: creating such a view refuses (the
    reference's creation-time guard), and the inner-filter QUERY never
    rewrites onto the WHERE-form view."""
    import shutil

    base = tmp_path_factory.mktemp("mv_ojf")
    where_form_view = """
    select a.key a_key, a.value a_value, b.value b_value
    from tab1 a left join tab2 b on a.key = b.key
    where b.value = 'cc'
    """
    s = _mk_session(spark, base, {"mv_ojw": where_form_view})
    try:
        inner_filter = """
        select a.key a_key, a.value a_value, b.value b_value
        from tab1 a left join (select * from tab2 where value = 'cc') b
        on a.key = b.key
        """
        # the two forms genuinely differ on this data
        assert _rows(spark.sql(inner_filter)) != \
            _rows(spark.sql(where_form_view))
        # the inner-filter query must NOT rewrite onto the WHERE view
        assert mv.try_rewrite(s, inner_filter) is None
        # the WHERE form itself still hits its own view, answers equal
        hit = mv.try_rewrite(s, where_form_view)
        assert hit is not None
        assert _rows(hit) == _rows(spark.sql(where_form_view))
        # and CREATING a null-side-filter view refuses outright
        with pytest.raises(mv.UnsupportedPlan, match="null-supplying"):
            s.create_material_view("mv_ojf_bad", str(base / "bad"),
                                   inner_filter)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_randomized_rewrite_soak_answers_always_match(spark,
                                                      tmp_path_factory):
    """Fuzz the newest code in the rewriter: 60 seeded-random queries
    over view7's table (random conjunct/disjunct predicates drawn from
    the supported vocabulary, random projection). Whatever the matcher
    decides, a HIT must produce exactly the rows direct execution
    produces — the property that makes every miss safe and every hit
    correct."""
    import random
    import shutil

    base = tmp_path_factory.mktemp("mv_fuzz")
    s = _mk_session(spark, base, {"material_view7": VIEW7})
    rng = random.Random(1234)
    atoms = ["k1>1", "k1>2", "k1<3", "k1<=3", "k1=5", "k1=4", "k1>=0",
             "range>=30", "range>30", "range<25", "range<24",
             "value!='a2'", "value='e3'", "k2='c'"]
    projs = ["a.k1,k2,value,range",
             "a.k1,k2,value,range,length(range) as lr",
             "k1,value", "k1,range"]
    hits = 0
    try:
        for i in range(60):
            n_dis = rng.randint(1, 3)
            disjuncts = []
            for _ in range(n_dis):
                cs = rng.sample(atoms, rng.randint(1, 3))
                disjuncts.append("(" + " and ".join(cs) + ")")
            pred = " or ".join(disjuncts)
            if rng.random() < 0.3:
                pred = f"({pred}) and {rng.choice(atoms)}"
            sql = (f"select {rng.choice(projs)} from tab3 a "
                   f"where {pred}")
            hit = mv.try_rewrite(s, sql)
            if hit is not None:
                hits += 1
                assert _rows(hit) == _rows(spark.sql(sql)), \
                    f"seed case {i}: rewrite diverged for:\n{sql}"
        # the fuzz must actually exercise the hit path, not just miss
        assert hits >= 3, f"only {hits} rewrites hit — vocabulary drift?"
    finally:
        shutil.rmtree(base, ignore_errors=True)
