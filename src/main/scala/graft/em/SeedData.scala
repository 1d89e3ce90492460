package graft.em

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reference seed dimensions (seeds/state_codes.csv etc., typed at
  * dbt_project.yml:86-104) as in-code data — tiny broadcast dims. State
  * codes/FIPS are public USPS/census facts.
  */
object SeedData {

  /** (state_code, state_name, fips_code) */
  val stateCodes: Seq[(String, String, String)] = Seq(
    ("AL", "Alabama", "01"), ("AK", "Alaska", "02"), ("AZ", "Arizona", "04"),
    ("AR", "Arkansas", "05"), ("CA", "California", "06"), ("CO", "Colorado", "08"),
    ("CT", "Connecticut", "09"), ("DE", "Delaware", "10"), ("FL", "Florida", "12"),
    ("GA", "Georgia", "13"), ("HI", "Hawaii", "15"), ("ID", "Idaho", "16"),
    ("IL", "Illinois", "17"), ("IN", "Indiana", "18"), ("IA", "Iowa", "19"),
    ("KS", "Kansas", "20"), ("KY", "Kentucky", "21"), ("LA", "Louisiana", "22"),
    ("ME", "Maine", "23"), ("MD", "Maryland", "24"), ("MA", "Massachusetts", "25"),
    ("MI", "Michigan", "26"), ("MN", "Minnesota", "27"), ("MS", "Mississippi", "28"),
    ("MO", "Missouri", "29"), ("MT", "Montana", "30"), ("NE", "Nebraska", "31"),
    ("NV", "Nevada", "32"), ("NH", "New Hampshire", "33"), ("NJ", "New Jersey", "34"),
    ("NM", "New Mexico", "35"), ("NY", "New York", "36"), ("NC", "North Carolina", "37"),
    ("ND", "North Dakota", "38"), ("OH", "Ohio", "39"), ("OK", "Oklahoma", "40"),
    ("OR", "Oregon", "41"), ("PA", "Pennsylvania", "42"), ("RI", "Rhode Island", "44"),
    ("SC", "South Carolina", "45"), ("SD", "South Dakota", "46"), ("TN", "Tennessee", "47"),
    ("TX", "Texas", "48"), ("UT", "Utah", "49"), ("VT", "Vermont", "50"),
    ("VA", "Virginia", "51"), ("WA", "Washington", "53"), ("WV", "West Virginia", "54"),
    ("WI", "Wisconsin", "55"), ("WY", "Wyoming", "56"), ("DC", "District of Columbia", "11"),
    ("PR", "Puerto Rico", "72"), ("VI", "U.S. Virgin Islands", "78"),
    ("GU", "Guam", "66"), ("AS", "American Samoa", "60"), ("MP", "Northern Mariana Islands", "69")
  )

  def stateCodesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    stateCodes.toDF("state_code", "state_name", "fips_code")
  }

  /** Lookup keyed by every accepted spelling (2-letter code, full name
    * lowercased, FIPS) — the join-based replacement for the reference's
    * ~120-branch CASE mapper (macros/standardize_state_code.sql:2-62).
    * Columns: (state_key, canonical_code). */
  def stateKeyLookupDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    stateCodes.flatMap { case (code, name, fips) =>
      Seq(code.toLowerCase -> code, name.toLowerCase -> code, fips -> code)
    }.toDF("state_key", "canonical_code")
  }
}
