/* shim: std::function stands in for boost::function (C++11) */
#pragma once
#include <functional>
namespace boost { using std::function; }
