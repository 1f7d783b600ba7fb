package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** PG-flavored statements executed through the dialect front end, each with
  * a DuckDB oracle — the correctness gate proves the translation layer, not
  * just the underlying operators. */
object PgDialectOps {

  private def run(s: SparkSession, sql: String): DataFrame =
    s.sql(PgDialect.translateSelect(sql))

  val defs: Seq[Q] = Seq(

    Q("pd_cast_json_ops", Some("""
      SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
      FROM events
      WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50
      ORDER BY event_id""")) { (s, dir) =>
      run(s, """
        SELECT event_id, (props ->> 'k')::int4 AS k
        FROM events
        WHERE (props ->> 'k')::int4 > 50
        ORDER BY event_id""")
    },

    Q("pd_any_list", Some("""
      SELECT event_id, event_type FROM events
      WHERE event_type IN ('click', 'view')
      ORDER BY event_id""")) { (s, dir) =>
      run(s, """
        SELECT event_id, event_type FROM events
        WHERE event_type = ANY('{click,view}')
        ORDER BY event_id""")
    },

    Q("pd_regex_op", Some("""
      SELECT n_name FROM nation
      WHERE regexp_matches(n_name, 'NATION_1[0-9]')
      ORDER BY n_name""")) { (s, dir) =>
      run(s, "SELECT n_name FROM nation WHERE n_name ~ 'NATION_1[0-9]' ORDER BY n_name")
    },

    Q("pd_distinct_on", Some("""
      SELECT DISTINCT ON (user_id) user_id, event_id
      FROM events ORDER BY user_id, event_id DESC""")) { (s, dir) =>
      run(s, """
        SELECT DISTINCT ON (user_id) user_id, event_id
        FROM events ORDER BY user_id, event_id DESC""")
    },

    Q("pd_catalog_probe", Some("""
      SELECT CAST(oid AS BIGINT) AS oid, typname
      FROM (VALUES (16, 'bool'), (3802, 'jsonb')) t(oid, typname)
      ORDER BY oid""")) { (s, dir) =>
      run(s, """
        SELECT oid, typname FROM pg_catalog.pg_type
        WHERE typname = ANY('{bool,jsonb}')
        ORDER BY oid""")
    }
  )
}
