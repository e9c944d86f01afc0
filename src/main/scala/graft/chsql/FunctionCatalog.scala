package graft.chsql

/** Enumerable function registry for `SHOW FUNCTIONS` (showStmt FUNCTIONS
  * alternative, ClickHouseParser.py:12394-12443 — CH's system.functions).
  *
  * The list mirrors the `case "..."` arms of the expression dispatcher in
  * [[ChSql]] (funcCall + windowFn). It is pinned to the dispatcher source
  * by a ChSqlSpec test that re-extracts the case literals from
  * ChSql.scala and asserts set equality — adding a function to the match
  * without updating this catalog fails the test suite, so the catalog
  * cannot drift. Names are the lowercase forms the dispatcher matches on
  * (lookup in the engine is case-insensitive: `toYear` ≡ `toyear`).
  */
object FunctionCatalog {

  val names: Seq[String] = Seq(
    "abs", "acos", "adddays", "addhours", "addminutes", "addmonths",
    "addquarters", "addseconds", "addweeks", "addyears", "age", "any", "anylast",
    "argmax", "argmin", "array", "arrayall", "arrayavg", "arraycompact",
    "arrayconcat", "arraycount", "arraycumsum", "arraydifference",
    "arraydistinct", "arrayelement", "arrayenumerate",
    "arrayenumerateuniq", "arrayenumeratedense", "arrayexists",
    "arrayfill", "arrayreversefill", "arraysplit", "arrayreversesplit",
    "arrayauc",
    "arrayfilter", "arrayfirst", "arrayflatten", "arrayintersect",
    "arraylast", "arraymap", "arraymax", "arraymin", "arraypopback",
    "arraypopfront", "arraypushback", "arraypushfront", "arrayreverse",
    "arrayresize", "arrayreversesort", "arrayslice", "arraysort", "arraystringconcat",
    "arraysum", "arrayuniq", "arrayzip", "avgarray", "uniqarray", "asin", "assumenotnull", "atan",
    "atan2", "avg", "avgif", "avgweighted", "bar", "base64decode",
    "base64encode", "bitand", "bitcount", "bitor", "bitshiftleft",
    "bitshiftright", "bittest", "bitxor",
    "bitmapand", "bitmapandcardinality", "bitmapandnot",
    "bitmapandnotcardinality", "bitmapbuild", "bitmapcardinality",
    "bitmapcontains", "bitmaphasall", "bitmaphasany", "bitmapmax",
    "bitmapmin", "bitmapor", "bitmaporcardinality", "bitmaptoarray",
    "bitmapxor", "bitmapxorcardinality",
    "cbrt", "ceil", "ceiling",
    "char_length", "character_length", "cityhash64", "coalesce", "concat",
    "concatwithseparator", "concat_ws", "corr", "cos", "cosh", "count", "countarray", "countdistinct",
    "countequal", "countif",
    "countsubstrings", "covarpop", "covarsamp", "date_diff", "date_trunc",
    "datediff", "datetrunc", "day", "degrees", "dense_rank", "denserank",
    "dictget", "dictgetordefault", "dicthas", "divide", "domain", "e",
    "editdistance", "empty", "emptyarraytosingle", "endswith", "exp",
    "exp10", "exp2", "expm1", "extract", "extracturlparameter",
    "querystring", "fragment", "querystringandfragment", "topleveldomain",
    "domainwithoutwww", "cutquerystring", "cutfragment",
    "cutquerystringandfragment", "cutwww", "pathfull", "decodeurlcomponent",
    "encodeurlcomponent", "netloc", "firstsignificantsubdomain",
    "countmatches", "positionutf8", "tokens", "splitbyregexp", "ascii",
    "char", "chr", "space", "sigmoid", "cot", "factorial", "intexp2",
    "intexp10", "ifnotfinite", "tonullable", "jsonextractkeys",
    "jsonextractraw", "visitparamextractraw",
    "first_value", "flatten", "floor", "formatdatetime",
    "percent_rank", "percentrank", "cume_dist", "cumedist", "nth_value",
    "nthvalue",
    "formatreadablequantity", "formatreadablesize", "frombase64",
    "frommodifiedjulianday", "fromunixtimestamp", "generateuuidv4",
    "mapadd", "mapsubtract", "mappopulateseries", "arraywithconstant",
    "bittestall", "bittestany", "formatreadabletimedelta",
    "dotproduct", "scalarproduct", "l1distance", "l2distance",
    "l2squareddistance", "linfdistance", "l1norm", "l2norm", "linfnorm",
    "cosinedistance", "arrayjaccardindex",
    "geodistance", "geohashdecode", "geohashencode", "greatcircleangle",
    "greatcircledistance", "pointinpolygon",
    "greatest", "grouparray", "grouparrayarray",
    "groupbitand", "groupbitmap", "groupbitor", "groupbitxor",
    "groupuniqarray", "has",
    "hasany", "hex", "if", "ifnull", "indexof", "intdiv", "intdivorzero",
    "ipv4numtostring", "ipv4stringtonum", "isfinite", "isinfinite",
    "isnan", "isnotnull", "isnull", "json_value", "jsonextractbool",
    "jsonextractfloat", "jsonextractint", "jsonextractstring", "jsonhas",
    "jsonlength", "kurtpop", "lag", "laginframe", "last_value", "lcase",
    "lead", "leadinframe", "neighbor", "runningdifference",
    "runningaccumulate", "torelativesecondnum", "torelativeminutenum",
    "torelativehournum", "torelativedaynum", "torelativeweeknum",
    "torelativemonthnum", "torelativequarternum", "torelativeyearnum",
    "substringindex", "initcap", "initcaputf8", "reverseutf8",
    "startswithutf8", "endswithutf8", "concatassumeinjective",
    "arrayrotateleft", "arrayrotateright",
    "least", "leftpad", "length", "lengthutf8", "levenshteindistance",
    "ln", "locate", "log", "log10", "log1p", "log2", "lower", "lowerutf8",
    "lpad", "mapcontains", "mapfromarrays", "map", "mapfromarrays", "mapkeys", "mapvalues",
    "left", "leftutf8", "match", "max", "maxarray", "maxif", "md5", "median", "mid", "min",
    "minarray", "minif",
    "minus", "modulo", "moduloorzero", "month", "multiif", "multiply",
    "multimatchany", "multimatchanyindex", "multisearchany",
    "multisearchfirstindex", "multisearchfirstposition", "ngramdistance",
    "hassubstr", "negate", "notempty", "now", "ntile", "nullif",
    "path", "pi", "plus", "position", "positioncaseinsensitive", "pow",
    "parsedatetimebesteffort", "parsedatetimebesteffortornull", "power",
    "protocol", "quantile", "quantilebfloat16", "quantileexact",
    "quantiles", "quantilestdigest", "quantilestiming", "quantiletdigest",
    "quantiletiming",
    "radians", "rand", "range", "rank", "repeat", "replace", "replaceall",
    "replaceregexpall", "retention", "reverse", "rightpad", "round",
    "roundbankers", "row_number", "rownumber", "rpad", "sequencecount",
    "right", "rightutf8", "sequencematch", "simplejsonextractfloat", "simplejsonextractint",
    "simplejsonextractstring", "simplelinearregression", "sha256", "sign",
    "sin", "singlevalueornull", "sumcount", "sumkahan", "anyheavy",
    "uniqtheta", "corrstable", "covarpopstable", "covarsampstable",
    "sinh", "siphash64", "boundingratio", "entropy", "skewsamp", "kurtsamp",
    "skewpop", "soundex", "splitbychar", "splitbystring", "sqrt",
    "startswith", "stddevpop", "stddevsamp", "substr", "substring",
    "substringutf8", "subtractdays", "subtracthours", "subtractminutes",
    "subtractmonths", "subtractquarters", "subtractseconds",
    "subtractweeks", "subtractyears", "sum", "sumarray", "sumif", "summap", "minmap", "maxmap",
    "tan",
    "tanh", "tobase64", "todate", "todatetime", "today", "todayofmonth",
    "todayofweek", "todayofyear", "todecimal128", "todecimal32",
    "todecimal64", "tofloat32", "tofloat64", "tohour", "toint16",
    "toint32", "toint64", "toint8", "toisoweek", "toisoyear", "toyearweek", "tolastdayofmonth",
    "timeslot", "timeslots", "monthname", "datename",
    "tominute", "tomonday", "tomonth", "topk", "toquarter", "tosecond",
    "todatetime64", "tofixedstring", "tointervalday", "tointervalhour",
    "tointervalminute", "tointervalmonth", "tointervalquarter",
    "tointervalsecond", "tointervalweek", "tointervalyear",
    "tomodifiedjulianday",
    "tostartofday", "tostartoffifteenminutes", "tostartoffiveminutes",
    "tostartofhour", "tostartofinterval", "tostartofminute", "tostartofmonth",
    "tostartofquarter", "tostartoftenminutes", "tostartofweek",
    "tostartofyear", "tostring",
    "touint16", "touint32", "touint64", "touint8", "tounixtimestamp",
    "translate", "translateutf8", "totypename", "toyear", "toyyyymm", "toyyyymmdd", "transform", "trim", "trimboth", "trimleft",
    "trimright", "tuple", "tupleelement", "ucase", "unhex", "uniq",
    "uniqcombined", "uniqexact", "uniqhll12", "uniqupto", "upper",
    "upperutf8", "varpop", "varsamp", "visitparamextractfloat",
    "visitparamextractint", "visitparamextractstring", "windowfunnel", "xxhash64", "year")

  /** Aggregate-ness as SHOW FUNCTIONS reports it (system.functions
    * `is_aggregate`): the dispatcher's own aggregate-name set, plus the
    * OVER-only ranking/navigation functions which CH also files there. */
  def isAggregate(name: String): Boolean = {
    val n = name.toLowerCase
    ChSql.AggNames.contains(n) ||
      (n.endsWith("if") && n.length > 2 && ChSql.AggNames.contains(n.dropRight(2)))
  }
}
